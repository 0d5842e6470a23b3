"""Tests for the flat layout model (SimpleBlock) and StandardDomTree protocol."""

import json

from bella_domify_spark.core.standard import count_tokens, to_standard
from bella_domify_spark.parsers import docxlike, markdown, txt
from bella_domify_spark.parsers.layout_flat import (
    flat_text,
    layout_parse,
    pdflike_layout,
)


def _pdf_payload():
    def blk(text, x0, y0, w):
        bbox = [x0, y0, x0 + w, y0 + 11]
        return {"type": 0, "bbox": bbox, "lines": [
            {"bbox": bbox, "dir": [1.0, 0.0],
             "spans": [{"text": text, "bbox": bbox, "font": "H", "size": 10.5}]}]}

    pages = []
    for i in range(3):
        pages.append({"width": 612.0, "height": 792.0, "blocks": [
            blk(f"Body {i} content here", 72, 200, 200),
            blk(f"Page {i + 1}", 280, 760, 40),   # footer: last block per page
            blk("Acme Header", 72, 30, 90),       # header: first by (y0,x0)
        ], "shapes": []})
    return json.dumps({"pages": pages})


class TestLayoutFlat:
    def test_pdf_blocks_sorted_and_holders_stripped(self):
        blocks = pdflike_layout(_pdf_payload())
        texts = [b.text for b in blocks]
        # header (first block, same de-numbered text every page) and footer
        # (last block, "Page N" → de-numbered equal) are voted out
        assert texts == ["Body 0 content here", "Body 1 content here",
                         "Body 2 content here"]

    def test_flat_text_leading_separator(self):
        blocks = layout_parse("hello world")
        assert flat_text(blocks) == "；hello world"

    def test_vertical_text_dropped(self):
        payload = json.dumps({"pages": [{"width": 612, "height": 792, "blocks": [
            {"type": 0, "bbox": [10, 10, 60, 20], "lines": [
                {"bbox": [10, 10, 60, 20], "dir": [0.0, 1.0],
                 "spans": [{"text": "rotated", "bbox": [10, 10, 60, 20]}]}]},
        ], "shapes": []}]})
        assert pdflike_layout(payload) == []

    def test_docx_layout_types(self):
        xml = ('<w:document><w:body><w:p><w:r><w:t>para</w:t></w:r></w:p>'
               '<w:tbl><w:tr><w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc>'
               '</w:tr></w:tbl></w:body></w:document>')
        blocks = layout_parse(xml)
        assert [b.type for b in blocks] == ["TEXT", "TABLE"]
        assert flat_text(blocks) == "；para； | c"


class TestStandardDomTree:
    def test_txt_single_node(self):
        std = to_standard(txt.parse("hello world test."))
        root = std["root"]
        assert root["tokens"] == count_tokens("hello world test.") == 4
        assert len(root["children"]) == 1
        child = root["children"][0]
        assert child["path"] == [1]
        assert child["element"]["type"] == "Text"
        assert child["element"]["text"] == "hello world test."

    def test_markdown_mapping_and_paths(self):
        std = to_standard(markdown.parse("# Title\n\npara one\n\n- item"))
        root = std["root"]
        title = root["children"][0]
        assert title["element"]["type"] == "Title"
        para = title["children"][0]
        assert para["path"] == [1, 1]
        item = para["children"][0]
        assert item["element"]["type"] == "ListItem"
        assert item["path"] == [1, 1, 1]
        # tokens roll up
        assert root["tokens"] == title["tokens"]
        assert title["tokens"] == (count_tokens("Title") + para["tokens"])

    def test_table_cells(self):
        xml = ('<w:document><w:body><w:p><w:r><w:t>intro</w:t></w:r></w:p>'
               '<w:tbl><w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>'
               '<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr></w:tbl>'
               '</w:body></w:document>')
        std = to_standard(docxlike.parse(xml))
        intro = std["root"]["children"][0]
        table = intro["children"][0]
        assert table["element"]["type"] == "Table"
        row = table["element"]["rows"][0]
        assert [c["text"] for c in row["cells"]] == ["a", "b"]
        assert row["cells"][0]["path"] == [0, 0, 0, 0]
        assert row["cells"][1]["path"] == [0, 0, 1, 1]
        assert row["cells"][0]["nodes"][0]["element"]["text"] == "a"

    def test_unmerged_name_degrades_to_text(self):
        # a TableName node with no adjacent Table sibling → type 'text'
        from bella_domify_spark.core.blocks import Line, Span, TextBlock
        from bella_domify_spark.core.tree import DomTree, Node

        tb = TextBlock(lines=[Line(spans=[Span(text="表 1 结果",
                                               bbox=(0, 1, 0, 1))],
                                   bbox=(0, 1, 0, 1))],
                       page_num=[0], is_table_name=True)
        tree = DomTree()
        tree.root.add_child(Node(tb))
        std = to_standard(tree)
        assert std["root"]["children"][0]["element"]["type"] == "text"

    def test_image_element_payload_roundtrip(self):
        # StandardImage {type, url, file_id} (standard_domtree.py:35-39):
        # provider URL + content-addressed file_id (= the payload's byte
        # fingerprint) ride the Figure element; without a provider the
        # image field stays None (reference emits image only when a link
        # exists, :280-299)
        from bella_domify_spark.core.blocks import Line, Span, TextBlock
        from bella_domify_spark.core.tree import DomTree, Node

        def img_block(link):
            sp = Span(is_image=True, bbox=(0, 0, 64, 48),
                      image_meta={"sha": "cafe1234deadbeef", "n_bytes": 321,
                                  "width": 64, "height": 48})
            b = TextBlock(lines=[Line(spans=[sp], bbox=(0, 0, 64, 48))],
                          page_num=[0])
            if link:
                b.image_link = link
                b.image_ocr_result = "ocr text here"
            return b

        tree = DomTree()
        tree.root.add_child(Node(img_block("stub://images/cafe1234deadbeef")))
        std = to_standard(tree)
        el = std["root"]["children"][0]["element"]
        assert el["type"] == "Figure"
        assert el["image"] == {"type": "image_url",
                               "url": "stub://images/cafe1234deadbeef",
                               "file_id": "cafe1234deadbeef"}
        assert std["root"]["children"][0]["tokens"] == 3  # ocr text here

        tree2 = DomTree()
        tree2.root.add_child(Node(img_block(None)))
        el2 = to_standard(tree2)["root"]["children"][0]["element"]
        assert el2["image"] is None

    def test_figure_name_merges_into_sibling_figure(self):
        # FigureName SIBLING of a Figure → merged name + summed tokens
        # (the gate payloads exercise the nested/unmerged degrade path;
        # this pins the merge path itself)
        from bella_domify_spark.core.blocks import Line, Span, TextBlock
        from bella_domify_spark.core.tree import DomTree, Node

        sp = Span(is_image=True, bbox=(0, 0, 64, 48),
                  image_meta={"sha": "beef", "n_bytes": 9})
        fig = TextBlock(lines=[Line(spans=[sp], bbox=(0, 0, 64, 48))],
                        page_num=[0])
        fig.image_link = "stub://images/beef"
        fig.image_ocr_result = "two tokens"
        cap = TextBlock(lines=[Line(spans=[Span(text="Figure 7 caption",
                                                bbox=(0, 50, 64, 60))],
                                    bbox=(0, 50, 64, 60))],
                        page_num=[0], is_figure_name=True)
        tree = DomTree()
        tree.root.add_child(Node(fig))
        tree.root.add_child(Node(cap))
        std = to_standard(tree)
        kids = std["root"]["children"]
        assert len(kids) == 1
        el = kids[0]["element"]
        assert el["type"] == "Figure"
        assert el["name"] == "Figure 7 caption"
        assert el["image"]["file_id"] == "beef"
        assert kids[0]["tokens"] == 2 + 3  # ocr + merged caption tokens
