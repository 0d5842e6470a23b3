"""List-item recognition: ordered-list regex cascade + special-leading-char rule.

Semantics parity with the reference's list recognizer
(/root/reference/doc_parser/dom_parser/parsers/pdf/text/Lines.py:21-104):
the *first* matching pattern index (1-based) is the list type; its matched
prefix is the list tag. Lines starting with a "special" character (not
alnum/space/CJK/common punctuation) are unordered list items typed by that
character itself.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple, Union

# Port of Lines.ORDERED_LIST_PATTERN (Lines.py:21-64), order preserved —
# the rule index is the list *type*, so ordering is semantics.
ORDERED_LIST_PATTERN = [
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*',  # 1.2.3.4.5.6.
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*',       # 1.2.3.4.5.6
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*',             # 1.2.3.4.5.
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*',                  # 1.2.3.4.5
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*',                        # 1.2.3.4.
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*',                             # 1.2.3.4
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*\.\s*',                                   # 1.2.3.
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*\d+\s*',                                        # 1.2.3
    r'^\s*\d+\s*\.\s*\d+\s*\.\s*',                                              # 1.2.
    r'^\s*\d+\s*\.\s*\d+\s*',                                                   # 1.2
    r'^\s*\d+\s*\.\s*',                                                         # 1.
    r'^\s*[⒈-⒛]\s*',                # ⒈..⒛ digit + full stop
    r'^\s*\d+、\s*',                           # digit + 顿号
    r'^\s*[一二三四五六七八九十百千万]+、\s*',    # CJK numeral + 顿号
    r'^\s*\d+[\)\]】）]\s*',                   # digit + closing bracket
    r'^\s*[\(\[【（]\d+[\)\]】）]\s*',          # bracketed digit
    r'^\s*[一二三四五六七八九十百千万]+[\)\]】）]\s*',
    r'^\s*[\(\[【（][一二三四五六七八九十百千万]+[\)\]】）]\s*',
    r'^\s*[a-z][\)\]】）]\s*',
    r'^\s*[A-Z][\)\]】）]\s*',
    r'^\s*[①-⑳]\s*',                # ①..⑳
    r'^\s*[⑴-⒇]\s*',                # ⑴..⒇
    r'^\s*[Ⓐ-ⓩ]\s*',                # Ⓐ..ⓩ
    r'^\s*\[\d+\]\s*',                        # [1],[2],...
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)篇\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)章\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)节\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)条\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)项\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)步\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)点\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)部分\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)部\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)段\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)例\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)个\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)阶段\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)层面\s*",
    r"^\s*第(?:[一二三四五六七八九十百千万]+|\d+)方面\s*",
    r".*\s*(.)\1{9,}\s*\d+\s*$",              # TOC leader line "text......12"
]

_COMPILED = [re.compile(p) for p in ORDERED_LIST_PATTERN]

# Unordered-list "special leading char": not word char / whitespace / CJK /
# common punctuation (Lines.py:91-98).
_SPECIAL_START = re.compile(r'^[^\w\s一-鿿.,!?;:\[\](){}\\/\'"“”‘’]')


def recognize_list(text: str) -> Tuple[Optional[Union[int, str]], Optional[str]]:
    """Return ``(list_type, list_tag)`` for a line's text.

    ``list_type`` is the 1-based ordered-pattern index, or the special leading
    character for unordered items, or ``None``. ``list_tag`` is the matched
    marker prefix.
    """
    for index, rule in enumerate(_COMPILED):
        m = rule.match(text)
        if m:
            return index + 1, m.group(0)
    m = _SPECIAL_START.match(text) if text else None
    if m:
        ch = m.group(0)
        return ch, ch
    return None, None
