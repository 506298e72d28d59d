"""URL resolution with .NET ``System.Uri`` compatibility quirks.

The reference resolves ``img@src`` / ``a@href`` against the page URL via
``Uri.TryCreate`` (``NReadabilityTranscoder.cs:1438-1471``) and
canonicalizes page URLs for next-page comparison
(``FindBaseUrl``, ``NReadabilityTranscoder.cs:507-588``). The behaviour
matrix in ``NReadabilityTranscoderTests.cs:450-518`` is the spec here —
notably: invalid/relative base URLs leave the value untouched, absolute
values of any scheme pass through, a bare ``?query`` replaces the base's
query, and no percent-encoding is ever introduced.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

from nreadability_spark.core import regexes

# Schemes .NET parses with an authority component; http(s)/ftp require a
# non-empty host for Uri.TryCreate(..., UriKind.Absolute) to succeed.
_AUTHORITY_SCHEMES = {"http", "https", "ftp"}
_KNOWN_SCHEMES = _AUTHORITY_SCHEMES | {"file", "mailto", "news", "nntp", "gopher"}


def try_parse_absolute(url):
    """Return urlsplit parts when ``url`` parses like a .NET absolute Uri,
    else None. ``http:immortal.pl`` (no authority) fails, matching
    ``TestReplacingImageUrls`` (TT:486-489)."""
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme:
        return None
    if scheme in _AUTHORITY_SCHEMES:
        if not parts.netloc:
            return None
        return parts
    if scheme == "file":
        return parts
    if scheme in _KNOWN_SCHEMES:
        return parts
    # unknown scheme, e.g. "p//immortal.pl/" has no colon so no scheme;
    # "custom:thing" parses as an opaque absolute URI in .NET
    return parts if ":" in url and url.index(":") == len(parts.scheme) else None


def is_absolute(url):
    return try_parse_absolute(url) is not None


def resolve_element_url(url, article_url):
    """Port of ResolveElementUrl (NReadabilityTranscoder.cs:1438-1471)."""
    if url is None:
        raise ValueError("url must not be None")

    if regexes.MAILTO_HREF_RE.search(url):
        return url

    base = try_parse_absolute(article_url)
    if base is None:
        return url

    # bare query string: attach to the base path (NRT:1457-1461)
    if url.startswith("?"):
        path = base.path or "/"
        return f"{base.scheme}://{base.netloc}{path}{url}"

    if is_absolute(url):
        return url

    resolved = urljoin(article_url, url)
    return resolved if resolved else url


def find_base_url(url):
    """Port of FindBaseUrl (NReadabilityTranscoder.cs:507-588):
    canonicalize a page URL for next-page-link comparison by dropping
    file extensions, EW-CMS ``,00`` noise, trailing page-number segments,
    ``index`` segments, and short leading-alpha segments."""
    parts = try_parse_absolute(url)
    if parts is None:
        return url

    protocol = parts.scheme
    hostname = parts.hostname or ""  # Uri.Host: lowercase, no port
    path = parts.path or "/"
    # reference appends '/' then splits; reproduce exactly (NRT:518-519)
    url_slashes = list(reversed((path + "/").split("/")))
    cleaned_segments = []

    for i, segment in enumerate(url_slashes):
        # split off anything that looks like a file type (NRT:528-537)
        if "." in segment:
            pieces = segment.split(".")
            possible_type = pieces[1]
            if not regexes.NON_ALPHA_RE.search(possible_type):
                segment = pieces[0]

        if ",00" in segment:
            segment = segment.replace(",00", "")

        if i in (0, 1) and regexes.PAGE_NUMBER_SEGMENT_RE.search(segment):
            segment = regexes.PAGE_NUMBER_SEGMENT_RE.sub("", segment)

        delete = False

        if i < 2 and regexes.PURE_INT_SEGMENT_RE.match(segment):
            delete = True

        if i == 0 and segment.lower() == "index":
            delete = True

        if i < 2 and len(segment) < 3 and not regexes.ANY_ALPHA_RE.search(url_slashes[0]):
            delete = True

        if not delete:
            cleaned_segments.append(segment)

    cleaned_segments.reverse()
    return f"{protocol}://{hostname}" + "/".join(cleaned_segments)


def combine(base_url, relative):
    """``new Uri(new Uri(base), relative).ToString()`` equivalent."""
    if is_absolute(relative):
        return relative
    return urljoin(base_url, relative)
