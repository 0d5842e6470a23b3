"""HTML main-content extraction (boilerplate strip + DOM heuristics).

ENGINE EXTENSION: the reference routes .html through its plain-text
converter (services/parse_manager.py:90-95) with no boilerplate removal;
the north star asks for a true strip, so these semantics are pinned here
rather than against reference fixtures.
"""

from bella_domify_spark.parsers import htmllike
from bella_domify_spark.parsers.dispatch import detect_format, parse_payload


def md(html: str) -> str:
    return htmllike.extract_text(html)


class TestBoilerplateStrip:
    def test_tag_level_strip(self):
        html = ("<html><head><title>T</title><style>p{a:1}</style>"
                "<script>var x = '<p>fake</p>';</script></head><body>"
                "<nav><a href='/'>Home</a></nav>"
                "<header>BANNER</header>"
                "<article><p>real content</p></article>"
                "<aside>related junk</aside>"
                "<footer>(c) corp</footer></body></html>")
        assert md(html) == "real content\n\n"

    def test_raw_text_elements_skip_inner_markup(self):
        # script/style bodies are raw text: '<' inside must not re-open
        # parsing before the literal close tag
        html = ("<html><body><script>if (a<b) { s = \"</div><p>\"; }</script>"
                "<p>kept</p></body></html>")
        assert md(html) == "kept\n\n"

    def test_class_id_heuristics(self):
        html = ("<html><body>"
                "<div class='sidebar'><p>widget</p></div>"
                "<div id='comments-area'><p>troll</p></div>"
                "<div class='content'><p>story</p></div>"
                "</body></html>")
        assert md(html) == "story\n\n"

    def test_role_hidden_and_display_none(self):
        html = ("<html><body>"
                "<div role='navigation'><p>menu</p></div>"
                "<div hidden><p>invisible</p></div>"
                "<div style='display: none'><p>also invisible</p></div>"
                "<p>visible</p></body></html>")
        assert md(html) == "visible\n\n"

    def test_nested_boilerplate_closes_correctly(self):
        html = ("<html><body><nav><div><ul><li>x</li></ul></div></nav>"
                "<p>after</p></body></html>")
        assert md(html) == "after\n\n"


class TestStructure:
    def test_heading_hierarchy(self):
        html = ("<html><body><h1>Top</h1><p>intro</p>"
                "<h2>Sub</h2><p>body</p></body></html>")
        tree = htmllike.parse(html)
        h1 = tree.root.child[0]
        assert h1.element.text == "Top"
        assert [c.element.text for c in h1.child] == ["intro", "Sub"]
        sub = h1.child[1]
        assert [c.element.text for c in sub.child] == ["body"]
        assert md(html) == "# Top\n\nintro\n\n## Sub\n\nbody\n\n"

    def test_list_items_nest_under_paragraph(self):
        html = ("<html><body><p>Options:</p>"
                "<ul><li>alpha</li><li>beta</li></ul></body></html>")
        tree = htmllike.parse(html)
        para = tree.root.child[0]
        assert [c.element.text for c in para.child] == ["alpha", "beta"]
        assert md(html) == "Options:\n\n- alpha\n\n- beta\n\n"

    def test_implicit_li_close(self):
        html = "<html><body><ul><li>one<li>two</ul></body></html>"
        assert md(html) == "- one\n\n- two\n\n"

    def test_entities_and_inline_tags(self):
        html = ("<html><body><p>A &amp; B &#60;kept&#62; <b>bold</b>"
                " <a href='x'>link</a> &hellip;</p></body></html>")
        assert md(html) == "A & B <kept> bold link …\n\n"

    def test_whitespace_collapse(self):
        html = "<html><body><p>a\n   b\t\tc</p></body></html>"
        assert md(html) == "a b c\n\n"

    def test_pre_preserves_whitespace(self):
        html = "<html><body><pre>x {\n  y\n}</pre></body></html>"
        assert md(html) == "x {\n  y\n}\n\n"

    def test_br_is_a_space(self):
        html = "<html><body><p>one<br>two</p></body></html>"
        assert md(html) == "one two\n\n"

    def test_table_with_spans(self):
        html = ("<html><body><table>"
                "<tr><th>h1</th><th colspan='2'>h23</th></tr>"
                "<tr><td rowspan='2'>tall</td><td>b</td><td>c</td></tr>"
                "<tr><td>d</td><td>e</td></tr>"
                "</table></body></html>")
        out = md(html)
        assert "<table>" in out
        assert "rowspan='2' colspan='1'>tall" in out
        assert "rowspan='1' colspan='2'>h23" in out

    def test_divs_as_paragraph_boundaries(self):
        html = "<html><body><div>first</div><div>second</div></body></html>"
        assert md(html) == "first\n\nsecond\n\n"


class TestRobustness:
    def test_unclosed_tags_and_strays(self):
        html = "<html><body></div><p>ok</span></strong></body>"
        assert md(html) == "ok\n\n"

    def test_unclosed_boilerplate_swallows_to_eof(self):
        html = "<html><body><p>kept</p><footer>junk <p>more junk"
        assert md(html) == "kept\n\n"

    def test_unclosed_heading_claims_one_run(self):
        html = "<html><body><h1>Title<p>not a heading</p></body></html>"
        assert md(html) == "# Title\n\nnot a heading\n\n"

    def test_comment_and_cdata_ignored(self):
        html = ("<html><body><!-- <p>no</p> --><p>yes</p>"
                "<![CDATA[<p>also no</p>]]></body></html>")
        assert md(html) == "yes\n\n"

    def test_surrogate_entities_stay_encoded(self):
        # a decoded lone surrogate is a valid Python str that utf-8/Arrow
        # CANNOT encode — it would kill the whole pandas-UDF batch; the
        # entity must stay literal
        out = md("<html><body><p>x &#xD800; y &#55296; z &#x41;</p></body></html>")
        out.encode("utf-8")     # must not raise
        assert out == "x &#xD800; y &#55296; z A\n\n"

    def test_nested_same_tag_inside_boilerplate(self):
        # a <div> inside a boiler <div> must consume its own close tag —
        # otherwise the boiler frame pops early and junk leaks
        html = ("<html><body><div class='sidebar'><div>ad</div>"
                "<p>leaked junk</p></div><p>real</p></body></html>")
        assert md(html) == "real\n\n"

    def test_li_context_ends_with_the_list(self):
        # implicitly-closed <li>s must not mark paragraphs AFTER the list
        html = ("<html><body><ul><li>one<li>two</ul>"
                "<p>normal paragraph</p></body></html>")
        assert md(html) == "- one\n\n- two\n\nnormal paragraph\n\n"

    def test_nested_table_content_not_dropped(self):
        # nested tables flatten into the parent cell; outer rows survive
        html = ("<html><body><table><tr><td>outer1</td></tr>"
                "<tr><td>pre <table><tr><td>inner</td></tr></table></td></tr>"
                "</table></body></html>")
        out = md(html)
        assert "outer1" in out and "inner" in out and "pre" in out

    def test_caption_precedes_table_in_output(self):
        # <caption> text lives at table level outside any cell; it must be
        # emitted BEFORE the table block, matching source order
        html = ("<html><body><p>intro</p>"
                "<table><caption>Table 1: stats</caption>"
                "<tr><td>a</td><td>b</td></tr></table>"
                "<p>outro</p></body></html>")
        out = md(html)
        assert "Table 1: stats" in out
        assert out.index("intro") < out.index("Table 1: stats") \
            < out.index("<table>") < out.index("outro")
        # same ordering when the document truncates before </table>
        out2 = md("<html><body><table><caption>Table 1: stats</caption>"
                  "<tr><td>a</td></tr>")
        assert out2.index("Table 1: stats") < out2.index("<table>")

    def test_garbage_never_raises(self):
        for payload in ["<html", "<html>", "<html><<<>>></whatever>",
                        "<html><table><td>x", "<html>&#xZZ; &unknown; ok",
                        "<html>" + "<div>" * 2000]:
            htmllike.parse(payload)  # must not raise


class TestDispatch:
    def test_detects_html(self):
        assert detect_format("<!DOCTYPE html><html></html>") == "htmllike"
        assert detect_format("<html lang='en'><body>x</body>") == "htmllike"
        assert detect_format("  <HTML>") == "htmllike"
        # docx detection keeps priority
        assert detect_format("<w:document>..") == "docxlike"
        assert detect_format("plain text") == "plaintext"

    def test_parse_payload_roundtrip(self):
        res = parse_payload("<html><body><nav>m</nav><h1>T</h1>"
                            "<p>body text</p></body></html>")
        assert res["status"] == "ok" and res["fmt"] == "htmllike"
        assert res["extracted_text"] == "# T\n\nbody text\n\n"
        assert res["n_nodes"] == 2

    def test_synthdocs_family_parses(self):
        from bella_domify_spark.synthdocs import _Rng, gen_htmllike
        for seed in range(30):
            payload = gen_htmllike(_Rng(seed))
            res = parse_payload(payload)
            assert res["status"] == "ok" and res["fmt"] == "htmllike"
            # boilerplate must never leak into the extraction
            assert "Privacy" not in res["extracted_text"]
            assert "©" not in res["extracted_text"]
            assert "document.title" not in res["extracted_text"]
            assert res["extracted_text"].startswith("# ")
