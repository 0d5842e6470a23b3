"""Deterministic synthetic transcript corpus (seed=42) per FIXTURES.md.

Schema = BASELINE.json input_hint:
    (conv_id string, turn_idx int32, role string, text string, tool string,
     ts timestamp)

Payload families:
    A plaintext (44%), B markdown (20%), C pdf-like glyph JSON (15%),
    D docx-like XML (7%), E xlsx-like (3%), F pptx-like (3%),
    H html page with boilerplate (6%)
plus ~2% empty/null turns (skip path).

Payload generators live in bella_domify_spark.synthdocs (shared with the
pdflike correctness gate and shipped in engine.zip); this module assembles
them into conversations. The companion ``transcripts_expected`` table is
produced by the frozen single-node oracle — the same pure parsing module
the Spark UDF uses (bella_domify_spark.parsers.dispatch.parse_payload) —
pre-computed at generation time so pytest can assert per-turn equality of
the *distributed* run against it (SURVEY.md §5.2). Reference-semantics
parity itself is pinned by hand-written unit tests in tests/.
"""

from __future__ import annotations

import os

import numpy as np

from bella_domify_spark.synthdocs import (  # noqa: F401 (re-exported)
    GEN_VERSION,
    _Rng,
    gen_docxlike,
    gen_htmllike,
    gen_markdown,
    gen_pdflike,
    gen_plaintext,
    gen_pptxlike,
    gen_xlsxlike,
)

# ---------------- corpus assembly ----------------

def _gen_conv(args):
    """One conversation's rows (top-level function for multiprocessing)."""
    ci, length, seed = args
    import datetime as dt

    conv_id = f"conv{ci:08d}"
    roles = ["user", "assistant", "tool"]
    base_ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    r = _Rng(seed * 1_000_003 + ci)
    rows = []
    for ti in range(length):
        u = r.rng.rand()
        if u < 0.01:
            text = None
        elif u < 0.02:
            text = ""
        elif u < 0.46:
            text = gen_plaintext(r)
        elif u < 0.52:
            text = gen_htmllike(r)
        elif u < 0.72:
            text = gen_markdown(r)
        elif u < 0.87:
            text = gen_pdflike(r)
        elif u < 0.94:
            text = gen_docxlike(r)
        elif u < 0.97:
            text = gen_xlsxlike(r)
        else:
            text = gen_pptxlike(r)
        fmt_tool = "doc_upload" if (text or "").startswith(
            ('{"pages"', '{"sheets"', '{"slides"', "<w:document")) else ""
        rows.append({
            "conv_id": conv_id,
            "turn_idx": np.int32(ti),
            "role": roles[ti % 3],
            "text": text,
            "tool": fmt_tool,
            "ts": base_ts + dt.timedelta(seconds=ci * 3600 + ti * 7),
        })
    return rows


def gen_transcripts_parallel(n_convs: int, seed: int = 42, processes: int = 16):
    """Deterministic corpus generation fanned out over processes — used for
    large bench corpora (expected outputs are not computed here)."""
    import multiprocessing as mp

    import pandas as pd

    rng = np.random.RandomState(seed)
    lengths = np.clip(rng.zipf(1.2, size=n_convs), 1, 512)
    args = [(ci, int(lengths[ci]), seed) for ci in range(n_convs)]
    with mp.Pool(processes) as pool:
        chunks = pool.map(_gen_conv, args, chunksize=8)
    rows = [r for c in chunks for r in c]
    df = pd.DataFrame(rows)
    perm = np.random.RandomState(seed + 1).permutation(len(df))
    return df.iloc[perm].reset_index(drop=True)


def gen_transcripts(n_convs: int = 100, seed: int = 42, with_expected: bool = True):
    """Return a pandas DataFrame of the transcript table (+expected columns).

    Conversation lengths ~ Zipf(1.2) clamped to [1, 512]; rows emitted in a
    deterministic shuffled order to force re-sorting downstream.
    """
    import pandas as pd

    from bella_domify_spark.parsers.dispatch import parse_payload

    rng = np.random.RandomState(seed)
    lengths = np.clip(rng.zipf(1.2, size=n_convs), 1, 512)
    rows = []
    for ci in range(n_convs):
        rows.extend(_gen_conv((ci, int(lengths[ci]), seed)))

    df = pd.DataFrame(rows)
    # deterministic shuffle to force the engine to re-establish turn order
    perm = np.random.RandomState(seed + 1).permutation(len(df))
    df = df.iloc[perm].reset_index(drop=True)

    if not with_expected:
        return df, None
    expected = df[["conv_id", "turn_idx"]].copy()
    parsed = [parse_payload(t if isinstance(t, str) else None) for t in df["text"]]
    expected["extracted_text"] = [p["extracted_text"] for p in parsed]
    expected["fmt"] = [p["fmt"] for p in parsed]
    expected["status"] = [p["status"] for p in parsed]
    return df, expected


def write_corpus(out_dir: str, n_convs: int = 100, seed: int = 42,
                 with_expected: bool = True):
    os.makedirs(out_dir, exist_ok=True)
    df, expected = gen_transcripts(n_convs=n_convs, seed=seed,
                                   with_expected=with_expected)
    # Spark's parquet reader rejects TIMESTAMP(NANOS); store microseconds
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(out_dir, "transcripts.parquet"), index=False)
    if expected is not None:
        expected.sort_values(["conv_id", "turn_idx"]).to_parquet(
            os.path.join(out_dir, "transcripts_expected.parquet"), index=False)
    return len(df)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fixtures/data/small")
    ap.add_argument("--convs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    n = write_corpus(args.out, n_convs=args.convs, seed=args.seed)
    print(f"wrote {n} turns to {args.out}")
