"""Plain-text parser: whole payload becomes ONE text node under root.

Parity: /root/reference/doc_parser/dom_parser/parsers/txt/converter.py:13-36
(single TextBlock holding the whole content as one span) and the flat layout
path /root/reference/doc_parser/layout_parser/txt_parser.py (single TEXT
SimpleBlock). Flatten therefore yields ``text + "\\n\\n"``.
"""

from __future__ import annotations

from bella_domify_spark.core.blocks import Line, Span, TextBlock
from bella_domify_spark.core.tree import DomTree, Node


def build_single_text_block(text: str) -> TextBlock:
    # bbox [0,1,0,1] placeholder as in TxtConverter._build_text_block.
    # NOTE: list recognition intentionally applies to the whole content
    # (Lines.restore → recognize_list), so a payload starting with e.g. "1. "
    # is typed List and flattens as "# 1. ..." — reference-faithful quirk.
    span = Span(text=text, bbox=(0.0, 1.0, 0.0, 1.0))
    line = Line(spans=[span], bbox=(0.0, 1.0, 0.0, 1.0))
    return TextBlock(lines=[line], page_num=[0])


def parse(text: str) -> DomTree:
    tree = DomTree()
    tree.root.add_child(Node(build_single_text_block(text)))
    return tree


def extract_text(text: str) -> str:
    """Flatten of the one-node tree; equals ``text + "\\n\\n"`` except for the
    list-recognition quirk above."""
    return parse(text).to_markdown()
