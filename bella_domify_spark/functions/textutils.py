"""Scalar text helpers shared by parsers and the document-level voters.

Parity targets in /root/reference:
- ``remove_number``: doc_parser/dom_parser/parsers/pdf/page/Pages.py:462-471
- sentence-end punctuation set: doc_parser/dom_parser/parsers/pdf/common/constants.py:31
- dot-leader (TOC item) pattern: page/Pages.py:197, domtree/domtree.py:105
"""

from __future__ import annotations

import re

SENTENCE_END_PUNC = '.．。?？!！'

# "(.)\1{9,}\d+": any char repeated >=10 times followed by digits — a TOC
# dot-leader line like "Introduction..........3".
CATALOG_ITEM_PATTERN = re.compile(r'(.)\1{9,}\d+')

_CHINESE_NUMBER = (
    r'[(一|二|三|四|五|六|七|八|九|十)万]?[(一|二|三|四|五|六|七|八|九)千]?'
    r'[(一|二|三|四|五|六|七|八|九)百]?[(一|二|三|四|五|六|七|八|九)十]?'
    r'[(一|二|三|四|五|六|七|八|九)]?'
)


def remove_number(text):
    """Strip Chinese and Arabic numerals so page headers/footers that differ
    only by a page number compare equal (Pages.py:462-471 semantics,
    including the quirky character-class construction)."""
    if text is None:
        return None
    text = re.sub(_CHINESE_NUMBER, '', text)
    text = re.sub(r'\d+', '', text)
    return text.strip()


def squash_spaces(text: str) -> str:
    """``text.replace(' ', '')`` — the normalization the reference applies
    before TOC/title membership checks (Pages.py:138, domtree.py:61)."""
    return text.replace(' ', '')


def iou(b1, b2) -> float:
    """Intersection-over-union of two (x0, y0, x1, y1) bboxes."""
    ix0, iy0 = max(b1[0], b2[0]), max(b1[1], b2[1])
    ix1, iy1 = min(b1[2], b2[2]), min(b1[3], b2[3])
    iw, ih = max(ix1 - ix0, 0.0), max(iy1 - iy0, 0.0)
    inter = iw * ih
    a1 = max(b1[2] - b1[0], 0.0) * max(b1[3] - b1[1], 0.0)
    a2 = max(b2[2] - b2[0], 0.0) * max(b2[3] - b2[1], 0.0)
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def is_position_matching(b1, b2) -> bool:
    """IoU > 0.7 position-identity test used by the header/footer vote
    (Pages.py:446-459)."""
    return iou(b1, b2) > 0.7
