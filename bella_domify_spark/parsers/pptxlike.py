"""Slide payload parsing (F7 — pptx layout text).

Transcripts carry no binary decks, so slide payloads arrive as JSON:

    {"slides": [{"shapes": [
        {"type": "text_box", "text": "..."},
        {"type": "placeholder", "placeholder": "body" | "picture"},
        {"type": "picture"},
        {"type": "table", "rows": [["a", "b"], ...]}]}]}

Parity target /root/reference/doc_parser/layout_parser/pptx_parser.py:22-67,
a layout-only format (the reference has no pptx domtree converter):
- non-picture placeholders emit a TEXT block with EMPTY text (quirk,
  pptx_parser.py:33-38 — the else branch ignores the placeholder's text);
- picture shapes and picture placeholders emit IMAGE blocks (no OCR here);
- text boxes emit TEXT blocks only when non-empty;
- a table flattens ALL cells row-major with " | ".join seeded by the empty
  string, so the text LEADS with " | " (quirk, pptx_parser.py:51-57);
- unknown shape types are skipped (the reference try/excepts per shape).
"""

from __future__ import annotations

import json

from bella_domify_spark.functions import fastjson
from typing import List


def layout_blocks(payload: str) -> List[tuple]:
    """[(type, text)] per shape; type ∈ {TEXT, IMAGE, TABLE}."""
    doc = fastjson.loads(payload)
    out: List[tuple] = []
    for slide in doc.get("slides", []):
        for shape in slide.get("shapes", []):
            kind = shape.get("type")
            if kind == "placeholder":
                if shape.get("placeholder") == "picture":
                    out.append(("IMAGE", None))
                else:
                    out.append(("TEXT", ""))  # quirk: text ignored
            elif kind == "picture":
                out.append(("IMAGE", None))
            elif kind == "text_box":
                if shape.get("text"):
                    out.append(("TEXT", shape["text"]))
            elif kind == "table":
                table_text = ""
                for row in shape.get("rows", []):
                    for cell in row:
                        table_text = " | ".join([table_text, str(cell)])
                if table_text:
                    out.append(("TABLE", table_text))
    return out


def flat_text(payload: str) -> str:
    """'；'-joined flat text (layout_parse_utils.py:100-107: TEXT/TABLE
    contribute their text, IMAGE its empty OCR result)."""
    return "".join("；" + (t or "") for _k, t in layout_blocks(payload))
