"""Tolerant HTML DOM: parser, tree, and XML-style serializer.

From-scratch equivalent of the reference's DOM layer, which is
``System.Xml.Linq`` + a lenient SGML reader (``SgmlDomBuilder.cs:42-84``,
``DomExtensions.cs:33-299``). The binding semantics reproduced here:

1.  tag/attribute names are lowercased (``SgmlDomBuilder.cs:71``);
2.  the lenient HTML DTD implies end tags: a start tag not allowed in the
    current element pops optional-end-tag ancestors until a legal
    container is found (``SgmlReader.cs:2560-2650`` ``ValidateContent``);
    the BODY element at stack depth 2 and the HTML root are never popped;
3.  whitespace-only text nodes are dropped (``SgmlDomBuilder.cs:73``);
4.  entities are expanded to characters at parse time and re-escaped
    minimally at serialization (XLinq behaviour);
5.  input after the final ``</html>`` is discarded
    (``SgmlDomBuilder.cs:54-66``);
6.  when the first content node is not ``<html>``, a simulated ``html``
    root element wraps the document (``SgmlReader.cs:1525-1545``);
7.  serialization is XLinq ``SaveOptions.DisableFormatting`` style:
    childless elements self-close as ``<name />``, text escapes
    ``& < >`` (and CR as ``&#xD;``), attributes are double-quoted and
    escape ``& < "`` plus TAB/LF/CR as character references;
8.  ``Element.remove_all()`` and ``set_inner_html()`` clear the element's
    *attributes* as well as its content — faithful to
    ``XElement.RemoveAll()`` as used at ``DomExtensions.cs:250`` and
    ``NReadabilityTranscoder.cs:768``, which is observable in the output
    (e.g. the glued ``<body>`` and ``<style>`` carry no attributes).

This file contains no Spark imports: it is shipped to Python workers and
must import fast (all tables are module-level constants).
"""

from __future__ import annotations

from html.parser import HTMLParser

XML_WHITESPACE = " \t\r\n"

# --- HTML 4.01 (loose) DTD tables driving implied-end-tag recovery -------

VOID_ELEMENTS = frozenset(
    "area base basefont br col frame hr img input isindex link meta param".split()
)

_INLINE = frozenset(
    # %fontstyle | %phrase | %special | %formctrl of the HTML 4 loose DTD
    "tt i b u s strike big small em strong dfn code samp kbd var cite abbr "
    "acronym a img applet object font basefont br script map q sub sup span "
    "bdo iframe input select textarea label button".split()
)

_BLOCK = frozenset(
    "p h1 h2 h3 h4 h5 h6 ul ol dir menu pre dl div center noscript noframes "
    "blockquote form isindex hr table fieldset address".split()
)

_FLOW = _INLINE | _BLOCK

# Elements whose end tag is optional in HTML 4 — the only ones the
# recovery loop may auto-close (everything else breaks the scan, matching
# ``ElementDecl.EndTagOptional`` checks in SgmlReader.cs:2600-2607).
OPTIONAL_END_TAG = frozenset(
    "body colgroup dd dt head html li option p tbody td tfoot th thead tr".split()
)

# Content models for the optional-end-tag elements (what they may contain).
_CONTAINS = {
    "html": frozenset(("head", "body", "frameset")),
    "head": frozenset("title base script style meta link object isindex".split()),
    "body": _FLOW | frozenset(("ins", "del", "script")),
    "p": _INLINE,
    "dt": _INLINE,
    "dd": _FLOW,
    "li": _FLOW,
    "option": frozenset(),
    "thead": frozenset(("tr",)),
    "tbody": frozenset(("tr",)),
    "tfoot": frozenset(("tr",)),
    "tr": frozenset(("td", "th")),
    "td": _FLOW,
    "th": _FLOW,
    "colgroup": frozenset(("col",)),
}

# Elements known to the HTML DTD. Unknown tags bypass validation entirely
# (SgmlReader.cs: nodes with null DtdType are allowed anywhere).
KNOWN_ELEMENTS = _FLOW | OPTIONAL_END_TAG | VOID_ELEMENTS | frozenset(
    "title style caption col colgroup optgroup legend ins del map area param "
    "frameset frame noframes applet object script select textarea label button "
    "abbr acronym bdo".split()
)


def parse_preserves(parent_name, child_name):
    """True iff the parser, on seeing ``child_name``'s start tag while
    ``parent_name`` is the innermost open element, leaves the parent open
    — i.e. ``_validate_content``'s scan breaks at its first iteration and
    the parent/child edge survives a serialize→reparse round-trip.

    Mirrors the loop in ``_validate_content`` exactly, except the
    BODY-at-stack-index-2 special case is dropped: callers use this to
    decide whether a reparse may be *elided*, so omitting the case is
    conservative (a body-in-fragment edge takes the real reparse path,
    never the reverse).
    """
    if child_name not in KNOWN_ELEMENTS:
        return True  # unknown elements are allowed anywhere
    if parent_name == "html":
        return True  # cannot pop the root element
    if parent_name not in KNOWN_ELEMENTS:
        return True  # unknown container: allows any content
    contains = _CONTAINS.get(parent_name)
    if contains is not None and child_name in contains:
        return True
    if parent_name not in OPTIONAL_END_TAG:
        return True  # required end tag: cannot auto-close
    if contains is None:
        return True  # optional-end element without a model: allows
    return False  # parent would be auto-closed before the child


class Node:
    """Base DOM node with a parent pointer and sibling navigation."""

    __slots__ = ("parent", "_pos")

    def __init__(self):
        self.parent = None
        self._pos = -1  # cached index within parent.children (a hint)

    def _index_in_parent(self):
        parent = self.parent
        if parent is None:
            return -1
        children = parent.children
        pos = self._pos
        if 0 <= pos < len(children) and children[pos] is self:
            return pos
        # hint stale after sibling mutations: rescan and refresh
        for i, child in enumerate(children):
            if child is self:
                self._pos = i
                return i
        return -1

    def next_node(self):
        """Following sibling, or None (detached nodes have no siblings)."""
        i = self._index_in_parent()
        if i < 0:
            return None
        siblings = self.parent.children
        return siblings[i + 1] if i + 1 < len(siblings) else None

    def remove(self):
        """Detach this node from its parent (no-op when detached)."""
        i = self._index_in_parent()
        if i >= 0:
            del self.parent.children[i]
        self.parent = None

    def replace_with(self, node):
        i = self._index_in_parent()
        if i < 0:
            return
        parent = self.parent
        if node.parent is not None:
            node = clone_node(node)
        parent.children[i] = node
        node.parent = parent
        node._pos = i
        self.parent = None

    def add_before_self(self, node):
        i = self._index_in_parent()
        if i < 0:
            return
        if node.parent is not None:
            node = clone_node(node)
        node.parent = self.parent
        node._pos = i
        self.parent.children.insert(i, node)

    def to_html(self):
        raise NotImplementedError


class Text(Node):
    __slots__ = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value

    def to_html(self):
        return escape_text(self.value)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Text({self.value!r})"


class Comment(Node):
    __slots__ = ("value",)

    def __init__(self, value):
        super().__init__()
        self.value = value

    def to_html(self):
        return f"<!--{self.value}-->"

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Comment({self.value!r})"


class _Container(Node):
    """Shared child-list behaviour for Element and Document."""

    __slots__ = ("children",)

    def __init__(self):
        super().__init__()
        self.children = []

    # -- child management --------------------------------------------------
    #
    # XLinq parity: attaching a node that already has a parent attaches a
    # deep CLONE, leaving the original in place (XContainer.Add semantics).
    # This is observable in the reference: sibling elements merged into the
    # article content div at NReadabilityTranscoder.cs:1005-1018 are clones,
    # so later score lookups on them miss the score dictionary.

    def append(self, node):
        if node.parent is not None:
            node = clone_node(node)
        node.parent = self
        node._pos = len(self.children)
        self.children.append(node)
        return node

    def add(self, *nodes):
        for node in nodes:
            self.append(node)

    def add_first(self, node):
        if node.parent is not None:
            node = clone_node(node)
        node.parent = self
        node._pos = 0
        self.children.insert(0, node)
        return node

    def first_node(self):
        return self.children[0] if self.children else None

    def nodes(self):
        return list(self.children)

    # -- queries ------------------------------------------------------------

    def elements(self):
        """Direct child elements."""
        return [c for c in self.children if isinstance(c, Element)]

    def descendants(self):
        """All descendant elements in document order (self excluded)."""
        stack = [iter(self.children)]
        while stack:
            it = stack[-1]
            advanced = False
            for node in it:
                if isinstance(node, Element):
                    yield node
                    stack.append(iter(node.children))
                    advanced = True
                    break
            if not advanced:
                stack.pop()

    def descendant_nodes(self):
        stack = [iter(self.children)]
        while stack:
            it = stack[-1]
            advanced = False
            for node in it:
                yield node
                if isinstance(node, _Container):
                    stack.append(iter(node.children))
                    advanced = True
                    break
            if not advanced:
                stack.pop()

    def get_elements_by_tag_name(self, tag_name):
        """Descendant elements matching name, case-insensitively
        (DomExtensions.cs:269-283). Direct stack walk (document order)
        instead of the ``descendants()`` generator — this is the
        hottest DOM query in the extraction profile."""
        tag_name = tag_name.lower()
        out = []
        stack = self.children[::-1]
        while stack:
            node = stack.pop()
            if type(node) is Element:
                if node.name == tag_name:
                    out.append(node)
                if node.children:
                    stack.extend(node.children[::-1])
        return out

    def get_children_by_tag_name(self, tag_name):
        tag_name = tag_name.lower()
        return [e for e in self.children if isinstance(e, Element) and e.name == tag_name]

    # -- text ----------------------------------------------------------------

    @property
    def value(self):
        """Concatenated descendant text (XElement.Value semantics:
        comments excluded)."""
        parts = []
        stack = [iter(self.children)]
        while stack:
            it = stack[-1]
            advanced = False
            for node in it:
                if isinstance(node, Text):
                    parts.append(node.value)
                elif isinstance(node, Element):
                    stack.append(iter(node.children))
                    advanced = True
                    break
            if not advanced:
                stack.pop()
        return "".join(parts)

    # -- HTML fragments -------------------------------------------------------

    def inner_html(self):
        """Serialized concatenation of child nodes
        (DomExtensions.cs:221-236, DisableFormatting)."""
        return "".join(node.to_html() for node in self.children)


class Element(_Container):
    __slots__ = ("name", "attrs")

    def __init__(self, name, attrs=None):
        super().__init__()
        self.name = name
        self.attrs = dict(attrs) if attrs else {}

    # -- attributes -----------------------------------------------------------

    def get_attribute_value(self, name, default=None):
        return self.attrs.get(name, default)

    def set_attribute_value(self, name, value):
        """Set or, when value is None, remove (DomExtensions.cs:153-178)."""
        if value is None:
            self.attrs.pop(name, None)
        else:
            self.attrs[name] = value

    def get_id(self):
        return self.attrs.get("id", "")

    def set_id(self, value):
        self.set_attribute_value("id", value)

    def get_class(self):
        return self.attrs.get("class", "")

    def set_class(self, value):
        self.set_attribute_value("class", value)

    def get_style(self):
        return self.attrs.get("style", "")

    def set_style(self, value):
        self.set_attribute_value("style", value)

    def get_attributes_string(self, separator):
        """Join non-empty attribute values (DomExtensions.cs:180-219)."""
        return separator.join(v for v in self.attrs.values() if v)

    # -- structure ------------------------------------------------------------

    def remove_all(self):
        """Remove all content AND attributes (XElement.RemoveAll parity)."""
        for child in self.children:
            child.parent = None
        self.children.clear()
        self.attrs.clear()

    def set_inner_html(self, html):
        """Replace content by re-parsing an HTML fragment
        (DomExtensions.cs:238-263). Clears attributes first, because the
        reference calls XElement.RemoveAll().

        Fast path: a fragment with no ``<`` and no ``&`` contains no
        tags, comments, or entity references — the parser sees one data
        run and produces exactly one Text node (or nothing if
        whitespace-only). The sibling-merge stage (NRT:985) funnels
        every merged paragraph's raw text through here, so skipping the
        full HTMLParser for plain text is a major win on article-heavy
        payloads."""
        self.remove_all()
        if html and "<" not in html and "&" not in html:
            # emptiness gate matches build_document's (str.strip(), which
            # also covers \x0b/\x0c and Unicode spaces): a form-feed-only
            # fragment must produce no node on BOTH paths, like .NET's
            # IsNullOrWhiteSpace
            if html.strip():
                text = Text(html)
                text.parent = self
                text._pos = 0
                self.children.append(text)
            return
        tmp = build_document(html)
        if tmp.root is None:
            return
        # reference clones (nodes are parented, DomExtensions.cs:259-262);
        # moving from the discarded temp document is observably identical
        for node in tmp.root.children:
            node.parent = self
            node._pos = len(self.children)
            self.children.append(node)

    # -- serialization ----------------------------------------------------------

    def to_html(self):
        # iterative (explicit stack): serialization depth equals DOM
        # depth, and hostile rows nest thousands deep
        out = []
        stack = [self]
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                out.append(node)
            elif isinstance(node, Element):
                out.append("<")
                out.append(node.name)
                for k, v in node.attrs.items():
                    out.append(f' {k}="{escape_attr(v)}"')
                if node.children:
                    out.append(">")
                    stack.append(f"</{node.name}>")
                    for child in reversed(node.children):
                        stack.append(child)
                else:
                    out.append(" />")
            else:
                out.append(node.to_html())  # Text / Comment leaf
        return "".join(out)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Element {self.name} attrs={self.attrs} children={len(self.children)}>"


class Document(_Container):
    """Document node; at most one Element child (the root), plus comments."""

    __slots__ = ()

    @property
    def root(self):
        for child in self.children:
            if isinstance(child, Element):
                return child
        return None

    def get_body(self):
        root = self.root
        if root is None:
            return None
        body_elements = root.get_elements_by_tag_name("body")
        return body_elements[0] if body_elements else None

    def get_title(self):
        """Document title (DomExtensions.cs:50-79): None when rootless,
        '' when head/title missing."""
        root = self.root
        if root is None:
            return None
        heads = root.get_elements_by_tag_name("head")
        if not heads:
            return ""
        titles = heads[0].get_children_by_tag_name("title")
        if not titles:
            return ""
        return (titles[0].value or "").strip()

    def get_element_by_id(self, element_id):
        matches = [e for e in self.descendants() if e.attrs.get("id") == element_id]
        return matches[0] if len(matches) == 1 else (matches[0] if matches else None)

    def to_html(self):
        return self.inner_html()


# --- pretty (indented) serialization -----------------------------------


def _pretty_node(node, depth, in_mixed):
    """Serialization tokens for one element (iterative caller)."""
    open_tag = "<" + node.name + "".join(
        f' {k}="{escape_attr(v)}"' for k, v in node.attrs.items()
    )
    if not node.children:
        return [open_tag + " />"]
    tokens = [open_tag + ">"]
    mixed = in_mixed
    for child in node.children:
        if isinstance(child, Element):
            if not mixed:
                tokens.append("\n" + "  " * (depth + 1))
            tokens.append(("node", child, depth + 1, mixed))
        elif isinstance(child, Text):
            mixed = True
            tokens.append(child.to_html())
        else:  # Comment
            if not mixed:
                tokens.append("\n" + "  " * (depth + 1))
            tokens.append(child.to_html())
    if not mixed:
        tokens.append("\n" + "  " * depth)
    tokens.append(f"</{node.name}>")
    return tokens


def to_pretty_html(document):
    """XLinq-style indented serialization (``XDocument.ToString(
    SaveOptions.None)`` shape, SgmlDomSerializer.cs:70): two-space
    indentation, one element per line, and — the XmlWriter mixed-content
    rule — once a text node is written inside an element, indentation is
    suppressed for the remainder of that element's subtree and resumes
    after its end tag. Divergence from .NET: lines end with "\\n", not
    XmlWriterSettings' default "\\r\\n". Iterative (explicit stack):
    hostile rows nest thousands deep."""
    out = []
    top = []
    for i, child in enumerate(document.children):
        if i:
            top.append("\n")
        top.append(("node", child, 0, False) if isinstance(child, Element) else child.to_html())
    stack = list(reversed(top))
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            out.append(item)
            continue
        _tag, node, depth, in_mixed = item
        for t in reversed(_pretty_node(node, depth, in_mixed)):
            stack.append(t)
    return "".join(out)


def _shallow_clone(node):
    if isinstance(node, Text):
        return Text(node.value)
    if isinstance(node, Comment):
        return Comment(node.value)
    if isinstance(node, Element):
        return Element(node.name, node.attrs)
    raise TypeError(f"cannot clone {type(node).__name__}")


def clone_node(node):
    """Deep copy of a node, detached (iterative: clone depth equals DOM
    depth)."""
    root = _shallow_clone(node)
    if not isinstance(node, Element):
        return root
    stack = [(node, root)]
    while stack:
        src, dst = stack.pop()
        for child in src.children:
            fresh = _shallow_clone(child)
            fresh.parent = dst
            fresh._pos = len(dst.children)
            dst.children.append(fresh)
            if isinstance(child, Element):
                stack.append((child, fresh))
    return root


# --- serialization escapes ---------------------------------------------------


def escape_text(value):
    """XLinq text-node escaping: & < > and CR."""
    if not value:
        return ""
    value = (
        value.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("\r", "&#xD;")
    )
    return value


def escape_attr(value):
    """XLinq attribute escaping: & < " plus TAB/LF/CR char references."""
    if not value:
        return ""
    return (
        value.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace('"', "&quot;")
        .replace("\t", "&#x9;")
        .replace("\n", "&#xA;")
        .replace("\r", "&#xD;")
    )


# --- parser -------------------------------------------------------------------


class _TreeBuilder(HTMLParser):
    """Builds the Node tree with SGML-style implied-end-tag recovery."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.document = Document()
        self.stack = [self.document]
        self._text_buf = []
        self._found_root = False

    # -- text buffering (a contiguous run is one node; whitespace-only runs
    # are dropped, mirroring WhitespaceHandling.None) -------------------------

    def _flush_text(self):
        if not self._text_buf:
            return
        data = "".join(self._text_buf)
        self._text_buf.clear()
        if not data.strip(XML_WHITESPACE):
            return  # whitespace-only text node: dropped
        self._ensure_root()
        top = self.stack[-1]
        kids = top.children
        if kids and type(kids[-1]) is Text:
            kids[-1].value += data
        else:
            # inlined _Container.append for the fresh-node case (parser
            # nodes never have a prior parent) — hot path
            node = Text(data)
            node.parent = top
            node._pos = len(kids)
            kids.append(node)

    # -- root simulation ---------------------------------------------------------

    def _ensure_root(self):
        """Wrap content in a simulated <html> root when the first content
        node is not an html element (SgmlReader.cs:1525-1545)."""
        if len(self.stack) > 1:
            return
        document = self.document
        existing = document.root
        if existing is not None:
            # content after the root closed: re-enter the root
            self.stack.append(existing)
            return
        root = Element("html")
        document.append(root)
        self.stack.append(root)
        self._found_root = True

    # -- implied end tags -----------------------------------------------------------

    def _validate_content(self, name):
        """Auto-close optional-end-tag ancestors that cannot contain
        ``name`` (SgmlReader.cs ValidateContent, lines 2560-2650)."""
        if name not in KNOWN_ELEMENTS:
            return  # unknown elements are allowed anywhere
        stack = self.stack
        top = len(stack) - 1
        i = top
        while i > 0:
            elem = stack[i]
            if not isinstance(elem, Element):
                break
            ename = elem.name
            if i == 2 and ename == "body":
                break  # never close BODY early
            if ename == "html":
                break  # cannot pop the root element
            if ename not in KNOWN_ELEMENTS:
                break  # unknown container: allow the content
            contains = _CONTAINS.get(ename)
            if contains is not None and name in contains:
                break
            if ename not in OPTIONAL_END_TAG:
                break  # required end tag: cannot auto-close
            if contains is None:
                break  # optional-end element w/o model: allow
            i -= 1
        if 0 < i < top:
            del stack[i + 1 :]  # nodes stay attached; only the open stack shrinks

    # -- HTMLParser callbacks ------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        self._flush_text()
        if self.stack[-1] is self.document and tag == "html" and self.document.root is None:
            element = Element(tag, _dedupe_attrs(attrs))
            self.document.append(element)
            self.stack.append(element)
            self._found_root = True
            return
        self._ensure_root()
        self._validate_content(tag)
        element = Element(tag, _dedupe_attrs(attrs))
        top = self.stack[-1]
        element.parent = top
        element._pos = len(top.children)
        top.children.append(element)
        if tag not in VOID_ELEMENTS:
            self.stack.append(element)

    def handle_startendtag(self, tag, attrs):
        # XML-style <tag/>: empty element, never pushed (SgmlReader IsEmpty)
        self._flush_text()
        if self.stack[-1] is self.document and tag == "html" and self.document.root is None:
            element = Element(tag, _dedupe_attrs(attrs))
            self.document.append(element)
            self.stack.append(element)
            self._found_root = True
            return
        self._ensure_root()
        self._validate_content(tag)
        self.stack[-1].append(Element(tag, _dedupe_attrs(attrs)))

    def handle_endtag(self, tag):
        self._flush_text()
        if tag in VOID_ELEMENTS:
            return
        stack = self.stack
        for i in range(len(stack) - 1, 0, -1):
            node = stack[i]
            if isinstance(node, Element) and node.name == tag:
                del stack[i:]
                return
        # no matching open element: stray end tag, ignored

    def handle_data(self, data):
        if data:
            self._text_buf.append(data)

    def handle_comment(self, data):
        self._flush_text()
        # comments may appear at document level (before any root)
        target = self.stack[-1]
        target.append(Comment(data))

    def handle_decl(self, decl):
        self._flush_text()  # DOCTYPE etc.: dropped

    def handle_pi(self, data):
        self._flush_text()  # processing instructions: dropped

    def unknown_decl(self, data):
        # CDATA sections -> text content
        if data.startswith("CDATA["):
            self._text_buf.append(data[6:])

    def finish(self):
        self.close()
        self._flush_text()
        del self.stack[1:]  # EOF auto-close
        return self.document


def _dedupe_attrs(attrs):
    """First occurrence wins; minimized attributes get their own name as
    value (SGML attribute minimization)."""
    out = {}
    for key, value in attrs:
        if key not in out:
            out[key] = value if value is not None else key
    return out


def build_document(html_content):
    """Lenient HTML -> Document (SgmlDomBuilder.cs:42-84 semantics):
    empty/whitespace input gives an empty document; input after the final
    ``</html>`` tag is discarded."""
    if html_content is None:
        raise ValueError("html_content must not be None")

    if not html_content.strip():
        return Document()

    idx = html_content.rfind("</html")
    if idx != -1:
        bracket = html_content.find(">", idx)
        if bracket != -1:
            html_content = html_content[: bracket + 1]

    builder = _TreeBuilder()
    builder.feed(html_content)
    return builder.finish()


# --- mutation-safe traversers ------------------------------------------------------


def traverse_elements(element, visitor):
    """Pre-order element walk that is safe under visitor mutation: the
    next sibling is captured before visiting a child, and a detached
    node's next sibling is None (ElementsTraverser.cs:46-63). Iterative
    — the explicit stack holds the pending sibling per depth, so walk
    depth never hits the Python recursion limit."""
    visitor(element)
    stack = [element.first_node() if isinstance(element, _Container) else None]
    while stack:
        child = stack[-1]
        if child is None:
            stack.pop()
            continue
        stack[-1] = child.next_node()  # capture before visiting (ET:50-61)
        if isinstance(child, Element):
            visitor(child)
            stack.append(child.first_node())


def traverse_child_nodes(container, visitor):
    """Child-node walk safe under mutation (ChildNodesTraverser.cs:46-63)."""
    child = container.first_node()
    while child is not None:
        nxt = child.next_node()
        visitor(child)
        child = nxt
