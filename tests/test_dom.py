"""DOM layer tests: ports of SgmlDomBuilderTests.cs, DomExtensionsTests.cs
and the parser-semantics details in SgmlDomBuilder.cs:42-84."""

from nreadability_spark.core.dom import (
    Comment,
    Element,
    Text,
    build_document,
)


def test_empty_input_gives_empty_document():
    assert build_document("").root is None
    assert build_document("   \n ").root is None


def test_simulated_html_root_wraps_fragments():
    doc = build_document("<div>hello</div>")
    assert doc.root is not None
    assert doc.root.name == "html"
    assert doc.root.children[0].name == "div"


def test_explicit_html_root_not_double_wrapped():
    doc = build_document("<html><body><p>x</p></body></html>")
    assert doc.root.name == "html"
    assert len(doc.root.get_children_by_tag_name("body")) == 1


def test_bare_text_gets_html_root():
    doc = build_document("test")
    assert doc.root.name == "html"
    assert doc.root.value == "test"


def test_tag_and_attribute_names_lowercased():
    doc = build_document('<DIV CLASS="Sidebar">x</DIV>')
    div = doc.root.children[0]
    assert div.name == "div"
    assert div.get_class() == "Sidebar"  # values keep case


def test_entities_expanded():
    # SgmlDomBuilderTests.cs:24-31
    doc = build_document("<html><body><p>a &raquo; b &amp; c</p></body></html>")
    p = doc.get_elements_by_tag_name("p")[0]
    assert p.value == "a » b & c"


def test_whitespace_only_text_nodes_dropped():
    doc = build_document("<html><body>\n  <p>x</p>\n  <p>y</p>\n</body></html>")
    body = doc.get_body()
    assert all(isinstance(c, Element) for c in body.children)


def test_nbsp_only_text_node_kept():
    # U+00A0 is not XML whitespace; SgmlReader keeps it
    doc = build_document("<html><body><p>&nbsp;</p></body></html>")
    p = doc.get_elements_by_tag_name("p")[0]
    assert p.value == " "


def test_content_after_final_html_close_discarded():
    # SgmlDomBuilder.cs:54-66 (codinghorror puts scripts after </html>)
    doc = build_document("<html><body><p>x</p></body></html><script>evil()</script>")
    assert not doc.get_elements_by_tag_name("script")


def test_paragraph_auto_closes_on_block():
    doc = build_document("<html><body><p>one<div>two</div></body></html>")
    body = doc.get_body()
    names = [c.name for c in body.elements()]
    assert names == ["p", "div"]


def test_paragraph_does_not_close_on_inline():
    doc = build_document("<html><body><p>one<b>two</b></p></body></html>")
    p = doc.get_elements_by_tag_name("p")[0]
    assert [e.name for e in p.elements()] == ["b"]


def test_li_closes_li():
    doc = build_document("<html><body><ul><li>a<li>b</ul></body></html>")
    ul = doc.get_elements_by_tag_name("ul")[0]
    assert [e.name for e in ul.elements()] == ["li", "li"]


def test_stray_end_tag_ignored():
    doc = build_document("<html><body><p>x</p></div></body></html>")
    assert doc.get_body().elements()[0].name == "p"


def test_unknown_elements_nest_anywhere():
    doc = build_document("<html><body><p>a<customtag>b</customtag></p></body></html>")
    p = doc.get_elements_by_tag_name("p")[0]
    assert [e.name for e in p.elements()] == ["customtag"]


def test_void_elements_never_pushed():
    doc = build_document("<html><body><p>a<br>b<img src='x'>c</p></body></html>")
    p = doc.get_elements_by_tag_name("p")[0]
    assert [e.name for e in p.elements()] == ["br", "img"]
    assert p.value == "abc"


def test_script_content_not_parsed():
    doc = build_document("<html><body><script>if (a < b) { x('<div>'); }</script></body></html>")
    assert not doc.get_elements_by_tag_name("div")
    script = doc.get_elements_by_tag_name("script")[0]
    assert "<div>" in script.value


def test_minimized_attribute_gets_name_as_value():
    doc = build_document("<html><body><option selected>x</option></body></html>")
    opt = doc.get_elements_by_tag_name("option")[0]
    assert opt.get_attribute_value("selected") == "selected"


def test_duplicate_attribute_first_wins():
    doc = build_document('<html><body><div id="a" id="b">x</div></body></html>')
    assert doc.get_elements_by_tag_name("div")[0].get_id() == "a"


# --- serialization (XLinq DisableFormatting style) --------------------------


def test_childless_element_self_closes():
    el = Element("style")
    assert el.to_html() == "<style />"
    el.set_attribute_value("type", "text/css")
    assert el.to_html() == '<style type="text/css" />'


def test_text_escaping_round_trip():
    doc = build_document("<html><body><p>a &lt; b &amp; c &gt; d</p></body></html>")
    p = doc.get_elements_by_tag_name("p")[0]
    assert p.value == "a < b & c > d"
    assert p.to_html() == "<p>a &lt; b &amp; c &gt; d</p>"
    # round trip is stable
    doc2 = build_document("<html><body>" + p.to_html() + "</body></html>")
    assert doc2.get_elements_by_tag_name("p")[0].value == "a < b & c > d"


def test_attribute_escaping():
    el = Element("a")
    el.set_attribute_value("href", 'x?a=1&b="q"<c')
    assert el.to_html() == '<a href="x?a=1&amp;b=&quot;q&quot;&lt;c" />'


def test_comment_preserved_and_serialized_raw():
    doc = build_document("<html><body><div><!-- <p>inside</p> -->text</div></body></html>")
    div = doc.get_elements_by_tag_name("div")[0]
    assert isinstance(div.children[0], Comment)
    assert "<!-- <p>inside</p> -->" in div.to_html()
    # comments don't contribute to value
    assert div.value == "text"


def test_inner_html_set_inner_html_round_trip():
    # DomExtensionsTests-style round trip
    doc = build_document('<html><body><div id="c"><p>a</p><p>b &amp; c</p></div></body></html>')
    div = doc.get_elements_by_tag_name("div")[0]
    inner = div.inner_html()
    assert inner == "<p>a</p><p>b &amp; c</p>"
    div.set_inner_html(inner)
    assert div.inner_html() == inner
    # set_inner_html clears attributes (XElement.RemoveAll parity)
    assert div.get_id() == ""


def test_get_title():
    doc = build_document("<html><head><title> T </title></head><body></body></html>")
    assert doc.get_title() == "T"
    assert build_document("<html><body></body></html>").get_title() == ""
    assert build_document("").get_title() is None


def test_cr_escaped_in_text():
    el = Element("p")
    t = Text("a\r\nb")
    el.append(t)
    assert el.to_html() == "<p>a&#xD;\nb</p>"


def test_clone_on_attach_when_parented():
    # XContainer.Add clones nodes that already have a parent
    doc = build_document("<html><body><div id='src'><p>x</p></div></body></html>")
    src = doc.get_elements_by_tag_name("div")[0]
    target = Element("section")
    target.add(*src.nodes())
    assert len(src.children) == 1  # original untouched
    assert len(target.children) == 1
    assert target.children[0] is not src.children[0]


def test_set_inner_html_plain_text_fast_path_matches_parse():
    """Fragments without '<'/'&' must produce exactly what a full parse
    produces: one Text node, or nothing for whitespace-only input."""
    from nreadability_spark.core.dom import Element, Text, build_document

    cases = [
        "plain text", "  leading and trailing  ", "\n\t ", "", "a > b",
        "multi\nline\ntext", "NUL\x00byte", "quote \" and ' mix", "]]>",
        # form-feed / vertical-tab only: str.strip() whitespace that the
        # old XML_WHITESPACE gate missed — must yield no node on BOTH
        # paths (.NET IsNullOrWhiteSpace covers these)
        "\x0c", "\x0b", " \x0b\x0c ",
    ]
    for s in cases:
        fast = Element("p")
        fast.set_inner_html(s)
        slow = Element("p")
        # force the parse path by routing through build_document manually
        tmp = build_document(s)
        if tmp.root is not None:
            for node in tmp.root.children:
                node.parent = slow
                slow.children.append(node)
        assert fast.to_html() == slow.to_html(), repr(s)
        assert all(isinstance(c, Text) for c in fast.children)


def test_pretty_serialization_xlinq_shape():
    """pretty_print output follows the XLinq/XmlWriter shape
    (SgmlDomSerializer.cs:70, SaveOptions.None): 2-space indentation,
    one element per line, text-only elements inline, and indentation
    suppressed for the rest of an element once mixed content starts."""
    from nreadability_spark.core.dom import build_document, to_pretty_html

    d = build_document(
        "<html><head><title>T</title></head>"
        "<body><p>text</p><div><p>a</p><p>b</p></div><!--c--></body></html>"
    )
    assert to_pretty_html(d) == (
        "<html>\n"
        "  <head>\n"
        "    <title>T</title>\n"
        "  </head>\n"
        "  <body>\n"
        "    <p>text</p>\n"
        "    <div>\n"
        "      <p>a</p>\n"
        "      <p>b</p>\n"
        "    </div>\n"
        "    <!--c-->\n"
        "  </body>\n"
        "</html>"
    )
    # mixed content: once text is written, indentation stops until the
    # element closes (leading text inlines the whole element; trailing
    # text glues the end tag)
    assert to_pretty_html(build_document("<div>x<p>y</p></div>")).endswith(
        "<div>x<p>y</p></div>\n</html>"
    )
    assert to_pretty_html(build_document("<div><p>y</p>tail</div>")).endswith(
        "<div>\n    <p>y</p>tail</div>\n</html>"
    )


def test_serialize_document_honors_pretty_print():
    from nreadability_spark.core.dom import build_document
    from nreadability_spark.core.transcoder import (
        SerializationOptions,
        serialize_document,
    )

    d = build_document("<html><head></head><body><div><p>a</p></div></body></html>")
    flags = dict(
        dont_include_content_type_meta=True,
        dont_include_mobile_meta=True,
        dont_include_generator_meta=True,
        dont_include_doctype=True,
    )
    raw = serialize_document(d, SerializationOptions(pretty_print=False, **flags))
    pretty = serialize_document(d, SerializationOptions(pretty_print=True, **flags))
    assert "\n" not in raw
    assert "\n  <body>" in pretty
    # both serializations parse back to the same raw form (indentation
    # whitespace between elements is dropped by the parser)
    assert build_document(pretty).to_html() == raw
