"""Charset decoding for binary payload tables — the reference's byte→str
front door, which the string-typed transcript model otherwise skips.

Reference semantics ported exactly:

- CSV layout parse tries ``['gbk', 'utf-8', 'utf-8-sig', 'latin1',
  'iso-8859-1']`` in order (csv_parser.py:21-27). gbk-FIRST is a pinned
  quirk: utf-8-encoded Chinese usually also decodes *successfully* under
  gbk as mojibake, and the reference ships that behavior.
- CSV→markdown tries ``['utf-8', 'gbk', ...]`` (csv_parser.py:44) —
  utf-8 first, so the same bytes decode differently on the two paths.
- txt conversion detects with chardet then decodes, falling back to gbk
  on decode failure (txt/converter.py:14-19). chardet is not installed
  in this environment, so ``detect_and_decode`` degrades to a
  utf-8 → gbk → latin1 try-cascade (documented approximation; the
  chardet branch activates automatically when the library is present).

latin1 maps every byte, so the cascades cannot fail in practice; the
ValueError mirrors the reference's terminal raise for completeness.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd  # module-level: pandas_udf resolves pd.Series hints here

CSV_LAYOUT_CASCADE = ("gbk", "utf-8", "utf-8-sig", "latin1", "iso-8859-1")
CSV_MARKDOWN_CASCADE = ("utf-8", "gbk", "utf-8-sig", "latin1", "iso-8859-1")


def decode_cascade(data: bytes,
                   charsets: Sequence[str] = CSV_LAYOUT_CASCADE) -> str:
    for cs in charsets:
        try:
            return data.decode(cs)
        except UnicodeDecodeError:
            continue
    raise ValueError("payload not decodable by any supported charset")


def detect_and_decode(data: bytes) -> str:
    """txt-converter semantics; see module docstring."""
    try:
        from chardet import detect
    except ImportError:
        return decode_cascade(data, ("utf-8", "gbk", "latin1"))
    enc = detect(data)["encoding"]
    if enc is None:
        # reference parity: decode(None) raises there and the handler
        # falls through to gbk (txt/converter.py:16-19)
        return data.decode("gbk")
    try:
        return data.decode(enc)
    except (UnicodeDecodeError, LookupError):
        return data.decode("gbk")


def decode_binary_column(df, bytes_col: str = "payload",
                         out_col: str = "text",
                         charsets: Sequence[str] = CSV_LAYOUT_CASCADE):
    """Binary column → decoded string column via one Arrow-batched stage;
    the pre-processing step that turns a bytes-payload corpus into the
    string transcript table every downstream operator consumes. NULL
    bytes stay NULL."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda b: decode_cascade(bytes(b), charsets)
                     if b is not None else None)

    return df.withColumn(out_col, _decode(F.col(bytes_col)))
