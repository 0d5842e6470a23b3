"""DOCX-like WordprocessingML parser: XML element-tree walk.

Parity: /root/reference/doc_parser/layout_parser/docx_parser.py:40-61 —
body elements in order; ``w:p`` paragraphs (empty skipped, embedded
``pic:pic`` → image block), ``w:tbl`` tables flattened by joining every cell
text with ``" | "`` (note the reference's leading ``" | "``: it folds each
cell via ``" | ".join([acc, cell])`` starting from the empty string).

Domtree enrichment (engine-side; the reference converts docx→pdf via unoconv
for its domtree, which we do not replicate): paragraphs styled
``Heading<N>`` become Title nodes nested by N; plain paragraphs become Text
nodes; tables become Table nodes attached under the current node. The
flattened text preserves the reference's body order.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

from bella_domify_spark.core.blocks import Cell, Line, Span, TableBlock, TextBlock
from bella_domify_spark.core.tree import DomTree, Node

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_HEADING_RE = re.compile(r"^Heading([1-9])$")


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _para_text(p) -> str:
    # concatenation of all w:t text runs, in document order
    return "".join(t.text or "" for t in p.iter() if _localname(t.tag) == "t")


def _para_style(p) -> Optional[str]:
    for el in p.iter():
        if _localname(el.tag) == "pStyle":
            for k, v in el.attrib.items():
                if _localname(k) == "val":
                    return v
    return None


def _has_image(p) -> bool:
    return any(_localname(el.tag) == "pic" for el in p.iter())


def _strip_ns(xml_text: str) -> str:
    """Make the WordprocessingML-subset namespace-agnostic: fixtures may or
    may not declare xmlns:w; ElementTree requires declared prefixes, so we
    rewrite w:/pic: prefixes into plain local names when undeclared."""
    if "xmlns" in xml_text.split(">", 1)[0]:
        return xml_text
    return re.sub(r"<(/?)(?:w|pic|a|r):", r"<\1", xml_text).replace(' w:val="', ' val="')


def parse_body(xml_text: str) -> List[Tuple[str, object]]:
    """Walk the body and return ordered items:
    ``("p", (text, style, has_image))`` / ``("tbl", rows:list[list[str]])``.
    """
    root = ET.fromstring(_strip_ns(xml_text))
    body = None
    for el in root.iter():
        if _localname(el.tag) == "body":
            body = el
            break
    if body is None:
        return []
    items: List[Tuple[str, object]] = []
    for element in body:
        name = _localname(element.tag)
        if name == "p":
            items.append(("p", (_para_text(element), _para_style(element), _has_image(element))))
        elif name == "tbl":
            rows = []
            for tr in element.iter():
                if _localname(tr.tag) != "tr":
                    continue
                row = []
                for tc in tr.iter():
                    if _localname(tc.tag) != "tc":
                        continue
                    # reference uses next(cell.itertext(), '') — FIRST text
                    # fragment only (docx_parser.py:59)
                    row.append(next((t.text for t in tc.iter()
                                     if _localname(t.tag) == "t" and t.text), ""))
                rows.append(row)
            items.append(("tbl", rows))
    return items


def flat_table_text(rows: List[List[str]]) -> str:
    """docx_parser.py:53-61 cell folding — note the leading ' | '."""
    table_text = ""
    for row in rows:
        for cell in row:
            table_text = " | ".join([table_text, cell])
    return table_text


def _text_block(text: str, page: int = 0, override: Optional[str] = None,
                is_title: bool = False) -> TextBlock:
    span = Span(text=text, bbox=(0.0, 1.0, 0.0, 1.0))
    line = Line(spans=[span], bbox=(0.0, 1.0, 0.0, 1.0))
    return TextBlock(lines=[line], page_num=[page], is_title=is_title,
                     layout_override=override)


def parse(xml_text: str) -> DomTree:
    tree = DomTree()
    # heading stack: (level, node); root is level 0
    stack: List[Tuple[int, Node]] = [(0, tree.root)]
    last_node = tree.root

    for kind, payload in parse_body(xml_text):
        if kind == "p":
            text, style, has_image = payload
            heading = _HEADING_RE.match(style) if style else None
            if text.strip():
                if heading:
                    level = int(heading.group(1))
                    while stack[-1][0] >= level:
                        stack.pop()
                    node = Node(_text_block(text, is_title=True))
                    stack[-1][1].add_child(node)
                    stack.append((level, node))
                    last_node = node
                else:
                    node = Node(_text_block(text))
                    stack[-1][1].add_child(node)
                    last_node = node
            if has_image:
                img = TextBlock(
                    lines=[Line(spans=[Span(is_image=True, bbox=(0.0, 1.0, 0.0, 1.0))],
                                bbox=(0.0, 1.0, 0.0, 1.0))],
                    page_num=[0],
                )
                node = Node(img)
                last_node.add_child(node) if last_node is not tree.root else tree.root.add_child(node)
        else:  # tbl
            rows = payload
            if not rows:
                continue
            ncols = max(len(r) for r in rows)
            cells = [
                [Cell(text=c, start_row=i, end_row=i, start_col=j, end_col=j)
                 for j, c in enumerate(r)]
                for i, r in enumerate(rows)
            ]
            tb = TableBlock(rows=cells, page_num=[0])
            parent = last_node if last_node is not tree.root else tree.root
            parent.add_child(Node(tb))
    return tree


def extract_text(xml_text: str) -> str:
    """Reference layout-parser equal flat text: every block contributes
    "；" + text — including the first, so the result starts with "；"
    (services/layout_parse_utils.py:100-107). Paragraph blocks use full text,
    table blocks :func:`flat_table_text`; image blocks are skipped (no OCR
    provider wired, matching test/conftest.py's empty provider)."""
    doc_text = ""
    for kind, payload in parse_body(xml_text):
        if kind == "p":
            text, _style, _img = payload
            if text.strip():
                doc_text += "；" + text
        else:
            t = flat_table_text(payload)
            if t:
                doc_text += "；" + t
    return doc_text
