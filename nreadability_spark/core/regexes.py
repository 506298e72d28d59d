"""Compiled regex constants of the readability scoring algorithm.

Semantics mirror the reference's pattern table
(``NReadabilityTranscoder.cs:109-134``). Patterns are compiled once at
module import, so each Spark Python worker pays the compile cost exactly
once per process (the reference's ``RegexOptions.Compiled`` analogue).

Two of the next/prev-link patterns embed a U+FFFD replacement character:
the reference source carries that mojibake literally (originally the
raquo/laquo guillemets), so we reproduce it byte-for-byte and *add* the
intended guillemets alongside for real-world inputs — the union matches a
superset that is identical on every reference fixture.
"""

import re

UNLIKELY_CANDIDATES_RE = re.compile(
    r"combx|comment|community|disqus|extra|foot|header|menu|remark|rss|shoutbox"
    r"|sidebar|sponsor|ad-break|agegate|pagination|pager|popup|tweet|twitter",
    re.IGNORECASE,
)

OK_MAYBE_ITS_A_CANDIDATE_RE = re.compile(
    r"and|article|body|column|main|shadow", re.IGNORECASE
)

POSITIVE_WEIGHT_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text|blog|story",
    re.IGNORECASE,
)

NEGATIVE_WEIGHT_RE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|outbrain"
    r"|promo|related|scroll|shoutbox|sidebar|side|sponsor|shopping|tags|tool|widget",
    re.IGNORECASE,
)

EXTRANEOUS_RE = re.compile(
    r"print|archive|comment|discuss|e[-]?mail|share|reply|all|login|sign|single|also",
    re.IGNORECASE,
)

DIV_TO_P_ELEMENTS_RE = re.compile(
    r"<(a|blockquote|dl|div|img|ol|p|pre|table|ul)", re.IGNORECASE
)

END_OF_SENTENCE_RE = re.compile(r"\.( |$)", re.MULTILINE)

BREAK_BEFORE_PARAGRAPH_RE = re.compile(r"<br[^>]*>\s*<p")

NORMALIZE_SPACES_RE = re.compile(r"\s{2,}")

KILL_BREAKS_RE = re.compile(r"(<br\s*\/?>(\s|&nbsp;?)*){1,}")

VIDEO_RE = re.compile(r"http:\/\/(www\.)?(youtube|vimeo)\.com", re.IGNORECASE)

REPLACE_DOUBLE_BRS_RE = re.compile(r"(<br[^>]*>[ \n\r\t]*){2,}", re.IGNORECASE)

REPLACE_FONTS_RE = re.compile(r"<(\/?)font[^>]*>", re.IGNORECASE)

ARTICLE_TITLE_DASH_RE_1 = re.compile(r" [\|\-] ")
ARTICLE_TITLE_DASH_RE_2 = re.compile(r"(.*)[\|\-] .*")
ARTICLE_TITLE_DASH_RE_3 = re.compile(r"[^\|\-]*[\|\-](.*)")
ARTICLE_TITLE_COLON_RE_1 = re.compile(r".*:(.*)")
ARTICLE_TITLE_COLON_RE_2 = re.compile(r"[^:]*[:](.*)")

# U+FFFD kept verbatim from the reference; guillemets added as the
# evident original intent (superset; see module docstring).
NEXT_LINK_RE = re.compile(
    "(next|weiter|continue|dalej|następna|nastepna"
    ">([^\\|]|$)|�([^\\|]|$)|»([^\\|]|$))",
    re.IGNORECASE,
)

PREV_LINK_RE = re.compile(
    "(prev|earl|old|new|wstecz|poprzednia|<|�|«)", re.IGNORECASE
)

MAILTO_HREF_RE = re.compile(r"^\s*mailto\s*:", re.IGNORECASE)

# Inline-use patterns of the next-page scorer (uncached in the reference;
# precompiled here).
HASH_FRAGMENT_RE = re.compile(r"#.*$")
TRAILING_SLASH_RE = re.compile(r"/$")
ANY_DIGIT_RE = re.compile(r"\d")
PAGEY_RE = re.compile(r"pag(e|ing|inat)", re.IGNORECASE)
FIRST_OR_LAST_RE = re.compile(r"(first|last)", re.IGNORECASE)
HREF_PAGINATION_RE = re.compile(r"p(a|g|ag)?(e|ing|ination)?(=|\/)[0-9]{1,2}", re.IGNORECASE)
HREF_PAGE_WORD_RE = re.compile(r"(page|paging)", re.IGNORECASE)
PAGE_NUMBER_SEGMENT_RE = re.compile(r"((_|-)?p[a-z]*|(_|-))[0-9]{1,2}$", re.IGNORECASE)
PURE_INT_SEGMENT_RE = re.compile(r"^[\d]{1,2}$")
NON_ALPHA_RE = re.compile(r"[^a-zA-Z]")
ANY_ALPHA_RE = re.compile(r"[a-z]", re.IGNORECASE)
