"""Main-content extraction: a from-scratch port of the readability
scoring algorithm, re-expressed as a pure function.

Semantics follow ``NReadabilityTranscoder.cs`` stage by stage (citations
inline). Differences by design:

- pure function: the reference mutates instance state during its
  too-little-content fallback rerun (``NReadabilityTranscoder.cs:313-326``,
  non-reentrant); here the retry is an explicit parameter, making the
  function thread-safe on Spark executors and a deterministic function of
  its inputs.
- deterministic tie-breaks: the reference iterates a ``HashSet`` in
  unspecified order when choosing the top candidate
  (``NReadabilityTranscoder.cs:890``); we fix document/insertion order,
  so ties resolve to the first-seen candidate, making output a pure
  function of the input bytes.
- null/empty input returns an empty result instead of throwing
  (``NReadabilityTranscoder.cs:286-289``); a 10^12-row job must not fail
  a task on one empty payload.
- spans: char offsets ``[start, end)`` of each top-level article child's
  text within the *raw* concatenated article text — an addition for
  conversation-level offset bookkeeping, not a reference feature.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from nreadability_spark.core import regexes, urls
from nreadability_spark.core.css import READABILITY_CSS
from nreadability_spark.core.dom import (
    XML_WHITESPACE,
    Comment,
    Document,
    Element,
    Text,
    build_document,
    parse_preserves,
    to_pretty_html,
    traverse_child_nodes,
    traverse_elements,
)

GENERATOR_NAME = "nreadability-spark 0.1.0"

OVERLAY_DIV_ID = "readOverlay"
INNER_DIV_ID = "readInner"
CONTENT_DIV_ID = "readability-content"
READABILITY_STYLED_CSS_CLASS = "readability-styled"

# Algorithm constants (NReadabilityTranscoder.cs:82-103)
MIN_PARAGRAPH_LENGTH = 25
MIN_INNER_TEXT_LENGTH = 25
PARAGRAPH_SEGMENT_LENGTH = 100
MAX_POINTS_FOR_SEGMENTS_COUNT = 3
MIN_SIBLING_PARAGRAPH_LENGTH = 80
MIN_COMMA_SEGMENTS = 10
LIS_COUNT_THRESHOLD = 100
MAX_IMAGES_IN_SHORT_SEGMENTS_COUNT = 2
MIN_INNER_TEXT_LENGTH_IN_ELEMENTS_WITH_EMBED = 75
CLASS_WEIGHT_THRESHOLD = 25
MAX_EMBEDS_COUNT = 1
MAX_ARTICLE_TITLE_LENGTH = 150
MIN_ARTICLE_TITLE_LENGTH = 15
MIN_ARTICLE_TITLE_WORDS_COUNT_1 = 3
MIN_ARTICLE_TITLE_WORDS_COUNT_2 = 4

SIBLING_SCORE_THRESHOLD_COEFFICIENT = 0.2
MAX_SIBLING_SCORE_THRESHOLD = 10.0
MAX_SIBLING_PARAGRAPH_LINKS_DENSITY = 0.25
MAX_HEADER_LINKS_DENSITY = 0.33
MAX_DENSITY_FOR_ELEMENTS_WITH_SMALLER_CLASS_WEIGHT = 0.2
MAX_DENSITY_FOR_ELEMENTS_WITH_GREATER_CLASS_WEIGHT = 0.5

MIN_ARTICLE_LENGTH_FOR_NO_FALLBACK = 250  # NRT:314

DOCTYPE = (
    '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN"\r\n'
    '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">\r\n'
)

_INT_RE = re.compile(r"^[+-]?\d+$")


@dataclass(frozen=True)
class SerializationOptions:
    """DomSerializationParams.cs:24-44 equivalent (defaults all-include)."""

    pretty_print: bool = False
    dont_include_content_type_meta: bool = False
    dont_include_mobile_meta: bool = False
    dont_include_doctype: bool = False
    dont_include_generator_meta: bool = False


@dataclass(frozen=True)
class ExtractionOptions:
    """Transcoder flags (NReadabilityTranscoder.cs:140-145) + hooks
    (NRT:1512-1525)."""

    dont_strip_unlikelys: bool = False
    dont_normalize_spaces: bool = False
    dont_weight_classes: bool = False
    reading_style: str = "Newspaper"   # Enums.cs ReadingStyle
    reading_margin: str = "Wide"       # Enums.cs ReadingMargin
    reading_size: str = "Medium"       # Enums.cs ReadingSize
    image_source_transformer: object = None
    anchor_href_transformer: object = None
    serialization: SerializationOptions = field(default_factory=SerializationOptions)


@dataclass
class ExtractResult:
    html: str                 # full transcoded page (Transcode output)
    content_html: str         # serialized article content div
    content_text: str         # normalized article inner text (equality target)
    title: str | None
    extracted: bool
    next_page_url: str | None
    spans: list               # [(start, end), ...] see module docstring


DEFAULT_OPTIONS = ExtractionOptions()


def extract(html_content, url=None, options=None):
    """HTML string -> ExtractResult. Pure and deterministic."""
    opts = options or DEFAULT_OPTIONS

    if html_content is None or html_content == "":
        return ExtractResult(
            html="", content_html="", content_text="", title=None,
            extracted=False, next_page_url=None, spans=[],
        )

    document = build_document(html_content)

    # Guaranteed-fallback short-circuit: the fallback (NRT:313-326)
    # triggers when the pass-1 article text is shorter than 250 chars.
    # The article's text is drawn from the document's Text nodes (Value
    # semantics exclude comments), every pipeline mutation only removes
    # or preserves text (double-<br> collapse, <font> rename, break
    # killing, strip/clean removals), and get_inner_text only trims and
    # collapses — so the pristine document's total Text length is an
    # upper bound on any pass-1 article length. Below the threshold,
    # pass 1 provably cannot avoid the fallback; run ONLY the fallback
    # pass, on the already-parsed tree. Pass 2 never reads pass-1 state
    # (it re-derives everything from a fresh parse of the same string,
    # and build_document is pure), so skipping pass 1 is observationally
    # identical.
    if (
        not opts.dont_strip_unlikelys
        and _document_text_upper_bound(document) < MIN_ARTICLE_LENGTH_FOR_NO_FALLBACK
    ):
        run = _Run(opts, dont_strip_unlikelys=True)
        document, article, title_text, next_page_url = run.transcode_to_xml(
            html_content, url, document=document
        )
    else:
        run = _Run(opts, dont_strip_unlikelys=opts.dont_strip_unlikelys)
        document, article, title_text, next_page_url = run.transcode_to_xml(
            html_content, url, document=document
        )

        # fallback: rerun once with unlikely-stripping disabled when the
        # extracted text is too short (NRT:313-326)
        if not opts.dont_strip_unlikelys and len(run.get_inner_text(article)) < MIN_ARTICLE_LENGTH_FOR_NO_FALLBACK:
            run = _Run(opts, dont_strip_unlikelys=True)
            document, article, title_text, next_page_url = run.transcode_to_xml(html_content, url)

    extracted = bool(article.children)
    content_text = run.get_inner_text(article)
    spans = _article_spans(article)
    html = serialize_document(document, opts.serialization)

    return ExtractResult(
        html=html,
        content_html=article.to_html(),
        content_text=content_text,
        title=title_text,
        extracted=extracted,
        next_page_url=next_page_url,
        spans=spans,
    )


def _document_text_upper_bound(document):
    """Total length of every Text node in the document — an upper bound
    on the text length of any article pass 1 could produce (see the
    guaranteed-fallback short-circuit in ``extract``). Comments are
    excluded to mirror Value semantics; a comment body can never become
    element text (parsed comment values cannot contain ``-->``, and no
    regex stage introduces one)."""
    total = 0
    for node in document.descendant_nodes():
        if isinstance(node, Text):
            total += len(node.value)
    return total


def _article_spans(article):
    """[start, end) offsets of each top-level child's text within the raw
    concatenated article text (skipping empty contributions)."""
    spans = []
    cursor = 0
    for child in article.children:
        if isinstance(child, Text):
            segment = len(child.value)
        elif isinstance(child, Element):
            segment = len(child.value)
        else:
            segment = 0
        if segment:
            spans.append((cursor, cursor + segment))
        cursor += segment
    return spans


class _Run:
    """One transcode pass: holds the element score table
    (the reference's ``_elementsScores``, NRT:153)."""

    def __init__(self, options, dont_strip_unlikelys):
        self.opts = options
        self.dont_strip_unlikelys = dont_strip_unlikelys
        self.scores = {}  # Element (identity) -> float; insertion-ordered

    # -- lifecycle (NRT:284-333) --------------------------------------------

    def transcode_to_xml(self, html_content, url, document=None):
        if document is None:
            document = build_document(html_content)

        self.prepare_document(document)

        if url:
            resolve_elements_urls(document, "img", "src", url, self.opts.image_source_transformer)
            resolve_elements_urls(document, "a", "href", url, self.opts.anchor_href_transformer)

        next_page_url = None
        if url is not None:
            next_page_url = self.find_next_page_link(document.get_body(), url)

        title_element, title_text = self.extract_article_title(document)
        article_content_element = self.extract_article_content(document)

        self.glue_document(document, title_element, article_content_element)

        return document, article_content_element, title_text, next_page_url

    # -- document preparation (NRT:590-638) -----------------------------------

    def prepare_document(self, document):
        document_body = get_or_create_body(document)
        root_element = document.root

        # one walk collecting all three target kinds; removal order is
        # preserved (scripts NRT:604-615, stylesheets NRT:617-623,
        # style tags NRT:625-628). Removals can't nest inside each
        # other in any order-observable way: all three target sets are
        # disjoint by element name.
        scripts, links, styles = [], [], []
        for el in root_element.descendants():
            name = el.name
            if name == "script":
                scripts.append(el)
            elif name == "link":
                links.append(el)
            elif name == "style":
                styles.append(el)

        to_remove = []
        for script in scripts:
            src = script.get_attribute_value("src", None)
            if not src or "readability" not in src:
                to_remove.append(script)
        _remove_elements(to_remove)

        _remove_elements(
            [
                el
                for el in links
                if el.get_attribute_value("rel", "").strip().lower() == "stylesheet"
                and "readability" not in el.get_attribute_value("href", "")
            ]
        )

        _remove_elements(styles)

        # double <br> -> <p>, <font> -> <span> on the serialized body, then
        # reparse (NRT:630-637)
        _serialized_regex_pass(
            document_body,
            [
                (regexes.REPLACE_DOUBLE_BRS_RE, "<p></p>"),
                (regexes.REPLACE_FONTS_RE, r"<\g<1>span>"),
            ],
            ("br", "font"),
        )

    # -- title (NRT:640-691) ----------------------------------------------------

    def extract_article_title(self, document):
        document_body = get_or_create_body(document)
        document_title = document.get_title() or ""
        current_title = document_title

        if regexes.ARTICLE_TITLE_DASH_RE_1.search(current_title):
            current_title = regexes.ARTICLE_TITLE_DASH_RE_2.sub(r"\1", document_title)
            if len(current_title.split(" ")) < MIN_ARTICLE_TITLE_WORDS_COUNT_1:
                current_title = regexes.ARTICLE_TITLE_DASH_RE_3.sub(r"\1", document_title)
        elif ": " in current_title:
            current_title = regexes.ARTICLE_TITLE_COLON_RE_1.sub(r"\1", document_title)
            if len(current_title.split(" ")) < MIN_ARTICLE_TITLE_WORDS_COUNT_1:
                current_title = regexes.ARTICLE_TITLE_COLON_RE_2.sub(r"\1", document_title)
        elif (
            len(current_title) > MAX_ARTICLE_TITLE_LENGTH
            or len(current_title) < MIN_ARTICLE_TITLE_LENGTH
        ):
            level_one_headers = document_body.get_elements_by_tag_name("h1")
            if len(level_one_headers) == 1:
                current_title = self.get_inner_text(level_one_headers[0])

        current_title = (current_title or "").strip()

        if len(current_title.split(" ")) <= MIN_ARTICLE_TITLE_WORDS_COUNT_2:
            current_title = document_title

        if not current_title:
            return None, None

        article_title_element = Element("h1")
        article_title_element.set_inner_html(current_title)

        return article_title_element, article_title_element.value

    # -- content (NRT:693-705) -----------------------------------------------------

    def extract_article_content(self, document):
        self.strip_unlikely_candidates(document)
        candidates = self.find_candidates_for_article_content(document)
        top_candidate = self.determine_top_candidate_element(document, candidates)
        article_content = self.create_article_content_element(document, top_candidate)
        self.prepare_article_content_element(article_content)
        return article_content

    # -- unlikely-candidate stripping (NRT:772-840) ---------------------------------

    def strip_unlikely_candidates(self, document):
        if self.dont_strip_unlikelys:
            return
        root = document.root
        if root is None:
            return

        def visitor(element):
            element_name = (element.name or "").lower()

            unlikely_match_string = element.get_class() + element.get_id()
            if (
                unlikely_match_string
                and element_name != "body"
                and element_name != "a"
                and regexes.UNLIKELY_CANDIDATES_RE.search(unlikely_match_string)
                and not regexes.OK_MAYBE_ITS_A_CANDIDATE_RE.search(unlikely_match_string)
            ):
                if element.parent is not None:
                    element.remove()
                return

            if element_name == "div":
                if not _div_inner_html_has_block_element(element):
                    # no block elements inside: rename to p (NRT:812)
                    element.name = "p"
                else:
                    # wrap stray text nodes in styled paragraphs (NRT:817-836)
                    def child_visitor(child_node):
                        if not isinstance(child_node, Text) or len(self.get_inner_text(child_node)) == 0:
                            return
                        para = Element("p")
                        para.set_inner_html(child_node.value)  # raw value, ws preserved
                        para.set_class(READABILITY_STYLED_CSS_CLASS)
                        para.set_style("display: inline;")
                        child_node.replace_with(para)

                    traverse_child_nodes(element, child_visitor)

        traverse_elements(root, visitor)

    # -- candidate scoring (NRT:842-884) ----------------------------------------------

    def find_candidates_for_article_content(self, document):
        para_elements = list(document.get_elements_by_tag_name("p"))
        candidate_elements = {}  # insertion-ordered set

        self.scores.clear()

        for para in para_elements:
            inner_text = self.get_inner_text(para)
            if len(inner_text) < MIN_PARAGRAPH_LENGTH:
                continue

            parent = para.parent if isinstance(para.parent, Element) else None
            grandparent = (
                parent.parent if parent is not None and isinstance(parent.parent, Element) else None
            )

            score = 1  # one point for having a paragraph
            score += get_segments_count(inner_text, ",")
            score += min(len(inner_text) // PARAGRAPH_SEGMENT_LENGTH, MAX_POINTS_FOR_SEGMENTS_COUNT)

            if parent is not None and parent.name != "html":
                candidate_elements[parent] = None
                self._add_points(parent, score)

            if grandparent is not None and grandparent.name != "html":
                candidate_elements[grandparent] = None
                self._add_points(grandparent, score // 2)  # integer half (NRT:879)

        return list(candidate_elements)

    # -- top candidate (NRT:886-918) -----------------------------------------------------

    def determine_top_candidate_element(self, document, candidates):
        top_candidate = None

        for candidate in candidates:
            score = self._get_score(candidate)
            # rescale by link density in place (NRT:892-898)
            new_score = (1.0 - self.get_links_density(candidate)) * score
            self.scores[candidate] = new_score
            if top_candidate is None or new_score > self._get_score(top_candidate):
                top_candidate = candidate

        if top_candidate is None or (top_candidate.name or "").lower() == "body":
            # fallback: synthesize a div holding clones of all body nodes
            # (NRT:907-915; XContainer.Add clones parented nodes)
            top_candidate = Element("div")
            document_body = get_or_create_body(document)
            top_candidate.add(*document_body.nodes())

        return top_candidate

    # -- sibling merge (NRT:920-1023) --------------------------------------------------------

    def create_article_content_element(self, document, top_candidate):
        article = Element("div")
        article.set_id(CONTENT_DIV_ID)

        parent = top_candidate.parent if isinstance(top_candidate.parent, Element) else None

        if parent is None:
            # detached synthetic element: attach directly (NRT:931-938)
            article.add(top_candidate)
            return article

        sibling_elements = parent.elements()

        top_score = self._get_score(top_candidate)
        sibling_score_threshold = max(
            MAX_SIBLING_SCORE_THRESHOLD,
            SIBLING_SCORE_THRESHOLD_COEFFICIENT * top_score,
        )
        top_class = top_candidate.get_class()

        for sibling in sibling_elements:
            append = False
            sibling_name = (sibling.name or "").lower()
            content_bonus = 0.0

            if top_class and sibling.get_class() == top_class:
                content_bonus += top_score * SIBLING_SCORE_THRESHOLD_COEFFICIENT

            if sibling is top_candidate:
                append = True
            elif self._get_score(sibling) + content_bonus >= sibling_score_threshold:
                append = True
            elif sibling_name == "p":
                sibling_text = self.get_inner_text(sibling)
                sibling_len = len(sibling_text)
                if sibling_len > 0:
                    if sibling_len >= MIN_SIBLING_PARAGRAPH_LENGTH:
                        append = self.get_links_density(sibling) < MAX_SIBLING_PARAGRAPH_LINKS_DENSITY
                    else:
                        append = (
                            self.get_links_density(sibling) == 0.0
                            and regexes.END_OF_SENTENCE_RE.search(sibling_text) is not None
                        )

            if append:
                if sibling_name in ("div", "p"):
                    element_to_append = sibling  # cloned on add (parented)
                else:
                    # rewrap non-block siblings in a div (NRT:1007-1016)
                    element_to_append = Element("div")
                    element_to_append.set_id(sibling.get_id())
                    element_to_append.set_class(sibling.get_class())
                    element_to_append.add(*sibling.nodes())
                article.add(element_to_append)

        return article

    # -- post-clean (NRT:1025-1077) ---------------------------------------------------------------

    def prepare_article_content_element(self, article):
        self.clean_styles(article)
        self.kill_breaks(article)

        self.clean(article, "form")
        self.clean(article, "object")
        self.clean(article, "h1")

        # a single h2 is probably a header, not a subheader (NRT:1035-1040)
        if len(article.get_elements_by_tag_name("h2")) == 1:
            self.clean(article, "h2")

        self.clean(article, "iframe")
        self.clean_headers(article)

        # order is semantics here (NRT:1045 comment)
        self.clean_conditionally(article, "table")
        self.clean_conditionally(article, "ul")
        self.clean_conditionally(article, "div")

        # remove empty paragraphs (NRT:1050-1073)
        to_remove = []
        for para in article.get_elements_by_tag_name("p"):
            if len(self.get_inner_text(para, dont_normalize_spaces=False)) > 0:
                continue
            if para.get_elements_by_tag_name("img"):
                continue
            if para.get_elements_by_tag_name("embed"):
                continue
            if para.get_elements_by_tag_name("object"):
                continue
            to_remove.append(para)
        _remove_elements(to_remove)

        # remove br's directly before paragraphs (NRT:1076)
        _serialized_regex_pass(
            article, [(regexes.BREAK_BEFORE_PARAGRAPH_RE, "<p")], ("br",)
        )

    # -- metrics ---------------------------------------------------------------------------------

    def get_links_density(self, element):
        """NRT:1079-1095."""
        inner_text = self.get_inner_text(element)
        length = len(inner_text)
        if length == 0:
            return 0.0
        links_length = sum(
            len(self.get_inner_text(anchor))
            for anchor in element.get_elements_by_tag_name("a")
        )
        return links_length / length

    def get_class_weight(self, element):
        """NRT:1105-1147: +-25 per positive/negative class and id match."""
        if self.opts.dont_weight_classes:
            return 0
        weight = 0
        element_class = element.get_class()
        if element_class:
            if regexes.NEGATIVE_WEIGHT_RE.search(element_class):
                weight -= 25
            if regexes.POSITIVE_WEIGHT_RE.search(element_class):
                weight += 25
        element_id = element.get_id()
        if element_id:
            if regexes.NEGATIVE_WEIGHT_RE.search(element_id):
                weight -= 25
            if regexes.POSITIVE_WEIGHT_RE.search(element_id):
                weight += 25
        return weight

    def get_inner_text(self, node, dont_normalize_spaces=None):
        """NRT:1149-1184: element/text value, trimmed; runs of whitespace
        collapsed unless normalization is off."""
        if dont_normalize_spaces is None:
            dont_normalize_spaces = self.opts.dont_normalize_spaces
        if isinstance(node, (Element, Document)):
            result = node.value
        elif isinstance(node, Text):
            result = node.value
        else:
            raise TypeError(f"nodes of type {type(node).__name__} are not supported")
        result = (result or "").strip()
        if not dont_normalize_spaces:
            return regexes.NORMALIZE_SPACES_RE.sub(" ", result)
        return result

    # -- cleaning ----------------------------------------------------------------------------------

    def kill_breaks(self, element):
        """NRT:1189-1192."""
        _serialized_regex_pass(element, [(regexes.KILL_BREAKS_RE, "<br />")], ("br",))

    def clean(self, root_element, element_name):
        """Remove descendants by tag, sparing youtube/vimeo embeds
        (NRT:1198-1219)."""
        elements = list(root_element.get_elements_by_tag_name(element_name))
        is_embed = element_name.lower() in ("object", "embed")
        to_remove = []
        for element in elements:
            if is_embed and (
                regexes.VIDEO_RE.search(element.get_attributes_string("|"))
                or regexes.VIDEO_RE.search(element.inner_html())
            ):
                continue
            to_remove.append(element)
        _remove_elements(to_remove)

    def clean_conditionally(self, root_element, element_name):
        """Remove 'fishy-looking' instances of a tag (NRT:1225-1283)."""
        elements = list(root_element.get_elements_by_tag_name(element_name))
        to_remove = []

        for element in elements:
            weight = self.get_class_weight(element)
            score = self._get_score(element)

            if weight + score < 0.0:
                to_remove.append(element)
                continue

            inner_text = self.get_inner_text(element)

            if get_segments_count(inner_text, ",") < MIN_COMMA_SEGMENTS:
                ps_count = len(element.get_elements_by_tag_name("p"))
                imgs_count = len(element.get_elements_by_tag_name("img"))
                lis_count = len(element.get_elements_by_tag_name("li"))
                inputs_count = len(element.get_elements_by_tag_name("input"))
                embeds_count = sum(
                    1
                    for embed in element.get_elements_by_tag_name("embed")
                    if not regexes.VIDEO_RE.search(embed.get_attribute_value("src", ""))
                )
                links_density = self.get_links_density(element)
                inner_text_length = len(inner_text)
                name_lower = element_name.strip().lower()

                remove = (
                    (imgs_count > ps_count)
                    or (
                        lis_count - LIS_COUNT_THRESHOLD > ps_count
                        and name_lower != "ul"
                        and name_lower != "ol"
                    )
                    or (inputs_count > ps_count // 3)
                    or (
                        inner_text_length < MIN_INNER_TEXT_LENGTH
                        and (imgs_count == 0 or imgs_count > MAX_IMAGES_IN_SHORT_SEGMENTS_COUNT)
                    )
                    or (
                        weight < CLASS_WEIGHT_THRESHOLD
                        and links_density > MAX_DENSITY_FOR_ELEMENTS_WITH_SMALLER_CLASS_WEIGHT
                    )
                    or (
                        weight >= CLASS_WEIGHT_THRESHOLD
                        and links_density > MAX_DENSITY_FOR_ELEMENTS_WITH_GREATER_CLASS_WEIGHT
                    )
                    or (
                        embeds_count > MAX_EMBEDS_COUNT
                        or (
                            embeds_count == MAX_EMBEDS_COUNT
                            and inner_text_length < MIN_INNER_TEXT_LENGTH_IN_ELEMENTS_WITH_EMBED
                        )
                    )
                )

                if remove:
                    to_remove.append(element)

        _remove_elements(to_remove)

    def clean_headers(self, element):
        """NRT:1288-1307."""
        to_remove = []
        for header_level in range(1, 7):
            for header in element.get_elements_by_tag_name(f"h{header_level}"):
                if (
                    self.get_class_weight(header) < 0
                    or self.get_links_density(header) > MAX_HEADER_LINKS_DENSITY
                ):
                    to_remove.append(header)
        _remove_elements(to_remove)

    def clean_styles(self, root_element):
        """NRT:1312-1327: strip style attrs except on readability-styled."""

        def visitor(element):
            if READABILITY_STYLED_CSS_CLASS in element.get_class():
                return
            element.set_style(None)

        traverse_elements(root_element, visitor)

    # -- glue (NRT:707-770) ----------------------------------------------------------------------------

    def glue_document(self, document, article_title_element, article_content_element):
        document_body = get_or_create_body(document)

        heads = list(document.get_elements_by_tag_name("head"))
        head_element = heads[0] if heads else None
        if head_element is None:
            head_element = Element("head")
            document_body.add_before_self(head_element)

        style_element = Element("style")
        style_element.set_attribute_value("type", "text/css")
        # set_inner_html clears attributes (XElement.RemoveAll parity), so
        # the glued <style> carries none — faithful to NRT:722+733
        style_element.set_inner_html(READABILITY_CSS)
        head_element.add(style_element)

        reading_style_class = get_user_style_class("style", self.opts.reading_style)
        document_body.set_class(reading_style_class)
        document_body.set_style("display: block;")

        inner_div = Element("div")
        inner_div.set_id(INNER_DIV_ID)
        inner_div.set_class(
            get_user_style_class("margin", self.opts.reading_margin)
            + " "
            + get_user_style_class("size", self.opts.reading_size)
        )

        if article_title_element is not None:
            inner_div.add(article_title_element)
        if article_content_element is not None:
            inner_div.add(article_content_element)

        overlay_div = Element("div")
        overlay_div.set_id(OVERLAY_DIV_ID)
        overlay_div.set_class(reading_style_class)
        overlay_div.add(inner_div)

        # XElement.RemoveAll also wipes the class/style set above (NRT:768)
        document_body.remove_all()
        document_body.add(overlay_div)

    # -- next-page link detection (NRT:340-502) --------------------------------------------------------------

    def find_next_page_link(self, body, url):
        if body is None:
            return None
        possible_pages = {}
        article_base_url = urls.find_base_url(url)

        for link in body.get_elements_by_tag_name("a"):
            link_href = link.get_attribute_value("href", None)
            if not link_href:
                continue
            if regexes.MAILTO_HREF_RE.search(link_href):
                continue

            link_href = regexes.HASH_FRAGMENT_RE.sub("", link_href)
            link_href = regexes.TRAILING_SLASH_RE.sub("", link_href)

            if link_href == "" or link_href == article_base_url or link_href == url:
                continue

            # different domain: skip (NRT:371-373)
            link_parts = urls.try_parse_absolute(link_href)
            if link_parts is not None:
                base_parts = urls.try_parse_absolute(article_base_url)
                base_host = base_parts.hostname if base_parts else None
                if link_parts.hostname != base_host:
                    continue

            link_text = self.get_inner_text(link)

            if regexes.EXTRANEOUS_RE.search(link_text) or len(link_text) > 25:
                continue

            link_href_leftover = link_href.replace(article_base_url, "")
            if not regexes.ANY_DIGIT_RE.search(link_href_leftover):
                continue

            if link_href not in possible_pages:
                entry = {"score": 0.0, "href": link_href, "text": link_text}
                possible_pages[link_href] = entry
            else:
                entry = possible_pages[link_href]
                entry["text"] += " | " + link_text

            if article_base_url not in link_href:
                entry["score"] -= 25

            link_data = f"{link_text} {link.get_class()} {link.get_id()}"

            if regexes.NEXT_LINK_RE.search(link_data):
                entry["score"] += 50
            if regexes.PAGEY_RE.search(link_data):
                entry["score"] += 25
            if regexes.FIRST_OR_LAST_RE.search(link_data):
                if not regexes.NEXT_LINK_RE.search(entry["text"]):
                    entry["score"] -= 65
            if regexes.NEGATIVE_WEIGHT_RE.search(link_data) or regexes.EXTRANEOUS_RE.search(link_data):
                entry["score"] -= 50
            if regexes.PREV_LINK_RE.search(link_data):
                entry["score"] -= 200

            # ancestor class/id walk (NRT:425-447)
            parent_node = link.parent
            positive_match = False
            negative_match = False
            while isinstance(parent_node, Element):
                class_and_id = f"{parent_node.get_class()} {parent_node.get_id()}"
                if not positive_match and regexes.PAGEY_RE.search(class_and_id):
                    positive_match = True
                    entry["score"] += 25
                if not negative_match and regexes.NEGATIVE_WEIGHT_RE.search(class_and_id):
                    if not regexes.POSITIVE_WEIGHT_RE.search(class_and_id):
                        entry["score"] -= 25
                        negative_match = True
                parent_node = parent_node.parent

            if regexes.HREF_PAGINATION_RE.search(link_href) or regexes.HREF_PAGE_WORD_RE.search(link_href):
                entry["score"] += 25
            if regexes.EXTRANEOUS_RE.search(link_href):
                entry["score"] -= 15

            link_number = _try_parse_int(link_text)
            if link_number is not None:
                if link_number == 1:
                    entry["score"] -= 10
                else:
                    entry["score"] += max(0, 10 - link_number)

        top_page = None
        for entry in possible_pages.values():
            if entry["score"] >= 50 and (top_page is None or top_page["score"] < entry["score"]):
                top_page = entry

        if top_page is not None:
            next_href = regexes.TRAILING_SLASH_RE.sub("", top_page["href"])
            return urls.combine(article_base_url, next_href)

        return None

    # -- score table ------------------------------------------------------------------------------------------

    def _add_points(self, element, points):
        self.scores[element] = self.scores.get(element, 0.0) + points

    def _get_score(self, element):
        return self.scores.get(element, 0.0)


# --- module-level pure helpers ------------------------------------------------------


def _parse_stable(element):
    """True iff reparsing ``element``'s serialized inner HTML provably
    reproduces the subtree unchanged, i.e. ``parse(serialize(T)) == T``
    for the child forest T — the precondition for eliding the reference's
    SetInnerHtml reparse (DomExtensions.cs:238-263).

    Conditions checked (each names the parser behaviour that would
    otherwise restructure the tree):

    - no ``script``/``style`` descendants — rawtext parses as CDATA
      while serialization escapes it;
    - every parent→child element edge *inside* the forest satisfies the
      implied-end-tag content model (``parse_preserves``): pipeline
      mutations such as the div→p rename (NRT:812) can build trees like
      ``<p><li>`` that a reparse restructures by auto-closing the ``p``.
      Top-level children are exempt: the fragment reparse opens them
      under a fresh ``html`` root, which is never popped;
    - no whitespace-only Text nodes (dropped by the parser) and no
      adjacent Text siblings (merged by the parser);
    - no Comment before the first Element/Text among the TOP-LEVEL
      children (including the comments-only case): the fragment reparse
      attaches pre-root comments to the temp Document, and
      ``set_inner_html`` copies only ``tmp.root.children`` — a real
      reparse drops them, so the elided path must not keep them.
    """
    for node in element.children:
        if isinstance(node, Comment):
            return False
        if isinstance(node, (Element, Text)):
            break
    stack = [element]
    while stack:
        parent = stack.pop()
        prev_was_text = False
        for node in parent.children:
            if isinstance(node, Element):
                prev_was_text = False
                if node.name in ("script", "style"):
                    return False
                if parent is not element and not parse_preserves(parent.name, node.name):
                    return False
                stack.append(node)
            elif isinstance(node, Text):
                if prev_was_text or not node.value.strip(XML_WHITESPACE):
                    return False
                prev_was_text = True
            else:
                prev_was_text = False
    return True


def _serialized_regex_pass(element, regex_repl_pairs, trigger_prefixes):
    """Run serialize -> regex-substitute -> SetInnerHtml, with both the
    serialization and the reparse elided when they provably change
    nothing.

    Every regex in these stages requires a literal ``<br``/``<font``
    (etc.) in the serialized form. Text and attribute values serialize
    with ``<`` escaped, so only (a) elements whose name starts with a
    trigger prefix and (b) raw comment bodies can produce a match; when
    neither exists, the substitution is a no-op. Eliding still requires
    the subtree to be a parser fixed point (``_parse_stable``) — the
    reference's reparse itself can restructure (rawtext re-escaping,
    implied end tags) even when the regexes match nothing. On the elided
    path only RemoveAll's attribute clearing remains observable. Prefix
    matching (not exact names) keeps the trigger scan a conservative
    superset: an unknown ``<brx>`` element also matches ``<br[^>]*>``
    and takes the slow path.
    """
    needs_pass = False
    for node in element.descendant_nodes():
        if isinstance(node, Element):
            if node.name.startswith(trigger_prefixes):
                needs_pass = True
                break
        elif isinstance(node, Comment):
            raw = node.to_html()
            if any(rx.search(raw) for rx, _repl in regex_repl_pairs):
                needs_pass = True
                break
    if not needs_pass and _parse_stable(element):
        element.attrs.clear()
        return
    inner = element.inner_html()
    new_inner = inner
    if needs_pass:
        for rx, repl in regex_repl_pairs:
            new_inner = rx.sub(repl, new_inner)
    _rewrite_inner_html(element, inner, new_inner)


def _rewrite_inner_html(element, old_inner, new_inner):
    """``element.SetInnerHtml(new_inner)`` with the reparse elided when
    it provably cannot change anything.

    The reference always reparses (DomExtensions.cs:238-263). Skipping
    is exactly equivalent when (a) the regex stage changed nothing
    (``new_inner == old_inner``, the overwhelmingly common case) and
    (b) the subtree is a parser fixed point per ``_parse_stable`` —
    rawtext elements, content-model-violating edges produced by pipeline
    mutations, and mergeable/droppable text nodes all force the real
    reparse. ``XElement.RemoveAll``'s attribute clearing is observable
    (e.g. the article div loses its id in KillBreaks) and is preserved
    on the skip path.
    """
    if new_inner == old_inner and _parse_stable(element):
        element.attrs.clear()
        return
    element.set_inner_html(new_inner)


def _div_inner_html_has_block_element(element):
    """Exactly equivalent to ``DIV_TO_P_ELEMENTS_RE.search(
    element.inner_html())`` (NRT:806) without serializing the subtree:
    text and attribute values serialize with ``<`` escaped, so only
    descendant element names (serialized as ``<name``) and raw comment
    bodies can produce a ``<tag`` match. The regex itself is applied to
    both so prefix semantics (e.g. ``<abbr`` matching ``<a``) are
    preserved bit-for-bit."""
    for node in element.descendant_nodes():
        if isinstance(node, Element):
            if regexes.DIV_TO_P_ELEMENTS_RE.match("<" + node.name):
                return True
        elif isinstance(node, Comment):
            if regexes.DIV_TO_P_ELEMENTS_RE.search(node.to_html()):
                return True
    return False


def get_segments_count(s, ch):
    """Segments, not separators: count + 1 (NRT:1097-1100)."""
    return s.count(ch) + 1


def get_user_style_class(prefix, enum_str):
    """Enum name -> css class, e.g. ('style', 'Newspaper') ->
    'style-newspaper' (NRT:1329-1358)."""
    out = []
    seen_upper = False
    for ch in enum_str:
        if ch.isupper():
            if seen_upper:
                out.append("-")
            seen_upper = True
            out.append(ch.lower())
        else:
            out.append(ch)
    return f"{prefix}-{''.join(out)}".rstrip("-")


def get_or_create_body(document):
    """NRT:1364-1383."""
    body = document.get_body()
    if body is None:
        html_elements = document.get_children_by_tag_name("html")
        if html_elements:
            html_element = html_elements[0]
        else:
            html_element = Element("html")
            document.add(html_element)
        body = Element("body")
        html_element.add(body)
    return body


def _remove_elements(elements):
    for element in elements:
        element.remove()


def resolve_elements_urls(document, tag_name, attribute_name, url, transformer):
    """NRT:1390-1436."""
    for element in list(document.get_elements_by_tag_name(tag_name)):
        attribute_value = element.get_attribute_value(attribute_name, None)
        if attribute_value is None:
            continue
        resolved = urls.resolve_element_url(attribute_value, url)
        if resolved:
            if transformer is not None:
                transformed_value, original_attr_name = transformer(resolved, element)
            else:
                transformed_value, original_attr_name = resolved, None
            element.set_attribute_value(attribute_name, transformed_value)
            if original_attr_name:
                element.set_attribute_value(original_attr_name, resolved)


def _try_parse_int(s):
    s = s.strip()
    if _INT_RE.match(s):
        try:
            return int(s)
        except ValueError:
            return None
    return None


def serialize_document(document, params=None):
    """SgmlDomSerializer.cs:40-78: meta injection + DOCTYPE prefix.
    ``pretty_print`` selects XLinq-style indented output
    (``SaveOptions.None``, SgmlDomSerializer.cs:70 — see
    ``dom.to_pretty_html``); default is DisableFormatting-style raw."""
    params = params or SerializationOptions()

    if not (
        params.dont_include_content_type_meta
        and params.dont_include_mobile_meta
        and params.dont_include_generator_meta
    ):
        root = document.root
        if root is None:
            raise ValueError("The document must have a root.")
        if (root.name or "").lower() != "html":
            raise ValueError("The document's root must be an html element.")
        heads = root.get_children_by_tag_name("head")
        if heads:
            head = heads[0]
        else:
            head = Element("head")
            root.add_first(head)
        _process_meta_elements(head, params)

    result = to_pretty_html(document) if params.pretty_print else document.to_html()

    if not params.dont_include_doctype:
        result = DOCTYPE + result

    return result


def _process_meta_elements(head, params):
    """SgmlDomSerializer.cs:94-186. AddFirst order: Generator, then
    HandheldFriendly, then Content-Type end up first-to-third."""
    if not params.dont_include_content_type_meta:
        for meta in head.get_children_by_tag_name("meta"):
            if meta.get_attribute_value("http-equiv", "").lower() == "content-type":
                meta.remove()
                break
        meta = Element("meta")
        meta.set_attribute_value("http-equiv", "Content-Type")
        meta.set_attribute_value("content", "text/html; charset=utf-8")
        head.add_first(meta)

    # viewport/HandheldFriendly removal is unconditional (SDS:127-150)
    for meta in head.get_children_by_tag_name("meta"):
        if meta.get_attribute_value("name", "").lower() == "viewport":
            meta.remove()
            break
    for meta in head.get_children_by_tag_name("meta"):
        if meta.get_attribute_value("name", "").lower() == "handheldfriendly":
            meta.remove()
            break
    if not params.dont_include_mobile_meta:
        meta = Element("meta")
        meta.set_attribute_value("name", "HandheldFriendly")
        meta.set_attribute_value("content", "true")
        head.add_first(meta)

    if not params.dont_include_generator_meta:
        for meta in head.get_children_by_tag_name("meta"):
            if meta.get_attribute_value("name", "").lower() == "generator":
                meta.remove()
                break
        meta = Element("meta")
        meta.set_attribute_value("name", "Generator")
        meta.set_attribute_value("content", GENERATOR_NAME)
        head.add_first(meta)
