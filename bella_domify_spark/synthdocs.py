"""Deterministic synthetic document payload generators (seeded).

Shared by fixtures/gen_corpus.py (test/bench corpus assembly) and the
pdflike correctness gate (parsers/pdflike/gate.py): both need bit-identical
payloads from a seed, and this module ships inside engine.zip so executors
can synthesize payloads cluster-side.

The PDF-like generator is a miniature typesetter: it wraps word streams into
justified lines (so centering/indent heuristics see realistic geometry),
adds repeated headers/footers, a dot-leader TOC, titles, ordered/unordered
lists, a ruled table with a merged cell + caption + reference, and optional
two-column pages.
"""

from __future__ import annotations

import json
from typing import List, Optional

import numpy as np

WORDS = (
    "the quick brown fox jumps over lazy dog spark engine table scan merge "
    "join order window batch stream column row page line span text block "
    "extract parse tree node title list data model layer shard salt skew "
    "partition manifest checkpoint lineage resume vector arrow batch turn "
    "conversation transcript payload format detect flatten markdown"
).split()

PAGE_W, PAGE_H = 612.0, 792.0
MARGIN = 72.0
LINE_H = 13.0
CHAR_W_FACTOR = 0.5  # char width ≈ size * 0.5


class _Rng:
    def __init__(self, seed: int):
        self.rng = np.random.RandomState(seed)

    def words(self, n: int) -> str:
        return " ".join(WORDS[self.rng.randint(0, len(WORDS))] for _ in range(n))

    def sentence(self, lo=6, hi=16) -> str:
        s = self.words(int(self.rng.randint(lo, hi)))
        return s[0].upper() + s[1:] + "."


# ---------------- family A: plaintext ----------------

def gen_plaintext(r: _Rng) -> str:
    paras = [r.sentence(8, 20) + " " + r.sentence(6, 14)
             for _ in range(int(r.rng.randint(1, 4)))]
    return "\n\n".join(paras)


# ---------------- family B: markdown (canonical form) ----------------

def gen_markdown(r: _Rng) -> str:
    parts = [f"# {r.words(3).title()}"]
    for _ in range(int(r.rng.randint(1, 3))):
        parts.append(f"## {r.words(2).title()}")
        parts.append(r.sentence(10, 22))
        if r.rng.rand() < 0.5:
            for _ in range(int(r.rng.randint(2, 4))):
                parts.append(f"- {r.words(4)}")
        if r.rng.rand() < 0.3:
            parts.append("```\n" + r.words(5) + "\n```")
        if r.rng.rand() < 0.3:
            parts.append("| a | b |\n| --- | --- |\n| "
                         + r.words(1) + " | " + r.words(1) + " |")
    return "\n\n".join(parts)


# ---------------- family D: docx-like XML ----------------

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def gen_docxlike(r: _Rng) -> str:
    body = []
    body.append('<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
                f'<w:r><w:t>{_esc(r.words(3).title())}</w:t></w:r></w:p>')
    for _ in range(int(r.rng.randint(1, 4))):
        body.append(f"<w:p><w:r><w:t>{_esc(r.sentence(8, 18))}</w:t></w:r></w:p>")
    if r.rng.rand() < 0.5:
        rows = []
        for _ in range(int(r.rng.randint(2, 4))):
            cells = "".join(
                f"<w:tc><w:p><w:r><w:t>{_esc(r.words(2))}</w:t></w:r></w:p></w:tc>"
                for _ in range(3))
            rows.append(f"<w:tr>{cells}</w:tr>")
        body.append("<w:tbl>" + "".join(rows) + "</w:tbl>")
    return "<w:document><w:body>" + "".join(body) + "</w:body></w:document>"


# ---------------- family E: xlsx-like sheet model ----------------

def gen_xlsxlike(r: _Rng) -> str:
    """Spreadsheet payload (FIXTURES.md): sheets of cell grids with optional
    merges, null cells and date cells — exercises F8/F9."""
    sheets = []
    for si in range(int(r.rng.randint(1, 3))):
        n_rows = int(r.rng.randint(2, 5))
        n_cols = int(r.rng.randint(2, 4))
        rows = []
        for _ in range(n_rows):
            row = []
            for _ in range(n_cols):
                u = r.rng.rand()
                if u < 0.08:
                    row.append(None)
                elif u < 0.16:
                    row.append({"date": [2026, int(r.rng.randint(1, 13)),
                                         int(r.rng.randint(1, 29)), 0, 0, 0]})
                elif u < 0.24:
                    row.append(float(r.rng.randint(0, 1000)))
                else:
                    row.append(r.words(int(r.rng.randint(1, 3))))
            rows.append(row)
        merged = []
        if n_rows >= 2 and n_cols >= 2 and r.rng.rand() < 0.5:
            merged.append([0, 1, 0, 2])  # 1x2 merge across the top-left
        sheets.append({"name": f"S{si}", "rows": rows, "merged": merged})
    return json.dumps({"sheets": sheets}, separators=(",", ":"))


# ---------------- family F: pptx-like slide model ----------------

def gen_pptxlike(r: _Rng) -> str:
    """Slide payload (FIXTURES.md): text boxes, placeholders (incl. the
    empty-text quirk), pictures and flattened tables — exercises F7."""
    slides = []
    for _ in range(int(r.rng.randint(1, 4))):
        shapes = [{"type": "text_box", "text": r.sentence(4, 10)}]
        u = r.rng.rand()
        if u < 0.3:
            shapes.append({"type": "placeholder", "placeholder": "body"})
        elif u < 0.5:
            shapes.append({"type": "placeholder", "placeholder": "picture"})
        if r.rng.rand() < 0.4:
            shapes.append({"type": "picture"})
        if r.rng.rand() < 0.4:
            shapes.append({"type": "table",
                           "rows": [[r.words(1), r.words(1)]
                                    for _ in range(int(r.rng.randint(1, 3)))]})
        slides.append({"shapes": shapes})
    return json.dumps({"slides": slides}, separators=(",", ":"))


# ---------------- family C: pdf-like glyph document ----------------

class _Typesetter:
    def __init__(self, size: float = 10.5, font: str = "Helvetica"):
        self.pages: List[dict] = []
        self.size = size
        self.font = font
        self._new_page()

    def _new_page(self):
        self.pages.append({"width": PAGE_W, "height": PAGE_H,
                           "blocks": [], "shapes": []})
        self.y = 100.0

    @property
    def page(self):
        return self.pages[-1]

    def _ensure_room(self, needed: float = LINE_H):
        if self.y + needed > PAGE_H - MARGIN:
            self._new_page()

    def _char_w(self, size=None):
        return (size or self.size) * CHAR_W_FACTOR

    def line(self, text: str, x0: float, size: Optional[float] = None,
             flags: int = 0, font: Optional[str] = None, y: Optional[float] = None):
        size = size or self.size
        font = font or self.font
        w = len(text) * self._char_w(size)
        yy = self.y if y is None else y
        bbox = [x0, yy, x0 + w, yy + size + 1.0]
        self.page["blocks"].append({
            "type": 0, "bbox": bbox,
            "lines": [{"bbox": bbox, "dir": [1.0, 0.0], "spans": [
                {"text": text, "bbox": bbox, "font": font, "size": size,
                 "flags": flags}]}],
        })
        if y is None:
            self.y += LINE_H

    def paragraph(self, text: str, x0: float = MARGIN, width: float = PAGE_W - 2 * MARGIN,
                  indent: bool = True, size: Optional[float] = None):
        size = size or self.size
        max_chars = int(width / self._char_w(size))
        words = text.split()
        cur = "    " if indent else ""
        first = True
        lines = []
        for w in words:
            cand = (cur + " " + w) if cur and not cur.endswith(" ") else cur + w
            if len(cand) > max_chars and cur.strip():
                lines.append((cur, first))
                cur, first = w, False
            else:
                cur = cand
        if cur.strip():
            lines.append((cur, first))
        for txt, is_first in lines:
            self._ensure_room()
            self.line(txt, x0, size=size)
        self.y += 4.0  # paragraph gap slightly above line gap

    def title(self, text: str, size: float = 16.0, bold: bool = True):
        self._ensure_room(size + 6)
        w = len(text) * self._char_w(size)
        x0 = (PAGE_W - w) / 2.0
        self.line(text, x0, size=size, flags=16 if bold else 0)
        self.y += 6.0

    @staticmethod
    def _img_meta(bbox) -> dict:
        """Deterministic byte-payload stand-in (P25): the length real RGB
        bytes would have and a content-address — what md5 over the bytes
        would give — derived from the image's geometry so payloads stay
        doc_id-only functions."""
        import hashlib
        n_bytes = int((bbox[2] - bbox[0]) * (bbox[3] - bbox[1]) * 3)
        key = f"{bbox[0]:.1f},{bbox[1]:.1f},{bbox[2]:.1f},{bbox[3]:.1f},{n_bytes}"
        return {"n_bytes": n_bytes,
                "sha": hashlib.md5(key.encode()).hexdigest()[:16]}

    def image(self, x0: float, y0: float, w: float, h: float):
        """Image span line at an absolute position (does not advance y) —
        overlapping text makes it a floating image (P5)."""
        bbox = [x0, y0, x0 + w, y0 + h]
        self.page["blocks"].append({
            "type": 0, "bbox": bbox,
            "lines": [{"bbox": bbox, "dir": [1.0, 0.0], "spans": [
                {"type": "image", "bbox": bbox, **self._img_meta(bbox)}]}],
        })

    def artifact(self, text: str, subtype: str = "Watermark",
                 x0: float = 150.0, y0: float = 300.0, size: float = 48.0):
        """Marked-content artifact block (P26 stand-in): a page-decoration
        text block tagged with its /Artifact subtype. A page containing a
        Watermark-subtype artifact has ALL its artifacts stripped at load
        (converter.py:229-244 quirk); without one they survive."""
        w = len(text) * self._char_w(size)
        bbox = [x0, y0, x0 + w, y0 + size + 1.0]
        self.page["blocks"].append({
            "type": 0, "bbox": bbox, "artifact": subtype,
            "lines": [{"bbox": bbox, "dir": [1.0, 0.0], "spans": [
                {"text": text, "bbox": bbox, "font": self.font,
                 "size": size, "flags": 0}]}],
        })

    def image_block(self, x0: float, y0: float, w: float, h: float):
        """Standalone type-1 image block (pymupdf rawdict shape) — the
        layout parser's IMAGE SimpleBlock source (pdf_parser.py:53-54) and
        glyphdoc's P25 recovery stand-in. Does not advance y."""
        bbox = [x0, y0, x0 + w, y0 + h]
        self.page["blocks"].append(
            {"type": 1, "bbox": bbox, **self._img_meta(bbox)})

    def style_last_line(self, kind: str = "underline"):
        """Underline stroke / strike stroke / highlight fill over the most
        recently emitted block's line (exercises P22 style metadata)."""
        blk = self.page["blocks"][-1]
        b = blk["bbox"]
        if kind == "underline":
            self.page["shapes"].append(
                {"kind": "stroke", "bbox": [b[0], b[3] - 0.5, b[2], b[3] + 0.5],
                 "color": 0, "width": 0.8})
        elif kind == "strike":
            mid = (b[1] + b[3]) / 2.0
            self.page["shapes"].append(
                {"kind": "stroke", "bbox": [b[0], mid - 0.4, b[2], mid + 0.4],
                 "color": 0, "width": 0.8})
        else:
            self.page["shapes"].append(
                {"kind": "fill", "bbox": [b[0] - 1, b[1] - 1, b[2] + 1, b[3] + 1],
                 "color": 0xFFFF00})

    def list_items(self, items: List[str], ordered: bool = True):
        for i, item in enumerate(items, start=1):
            self._ensure_room()
            marker = f"{i}. " if ordered else "• "
            self.line(marker + item, MARGIN + 10)
        self.y += 4.0

    def toc(self, titles: List[str]):
        self._ensure_room(LINE_H * (len(titles) + 1))
        self.line("目录", MARGIN)
        for i, t in enumerate(titles):
            dots = "." * max(10, 60 - len(t))
            self.line(f"{t}{dots}{i + 2}", MARGIN)
        self.y += 6.0

    def table(self, rows: List[List[str]], caption: Optional[str] = None,
              merged_first_row: bool = False, wrap_cells: bool = False):
        """``wrap_cells`` emits two stacked lines in any cell whose text
        contains a '/' (split there) — exercises the recursive cell layout
        (P17)."""
        n_rows, n_cols = len(rows), len(rows[0])
        col_w = (PAGE_W - 2 * MARGIN) / n_cols
        row_h = (2 * LINE_H + 6) if wrap_cells else (LINE_H + 6)
        self._ensure_room(row_h * n_rows + 3 * LINE_H)
        if caption:
            self.line(caption, MARGIN)
            self.y += 2.0
        top = self.y
        xs = [MARGIN + i * col_w for i in range(n_cols + 1)]
        ys = [top + i * row_h for i in range(n_rows + 1)]
        shapes = self.page["shapes"]
        for yy in ys:
            shapes.append({"kind": "stroke", "bbox": [xs[0], yy - 0.35, xs[-1], yy + 0.35],
                           "color": 0, "width": 0.7})
        for j, xx in enumerate(xs):
            # merged cell: skip the inner vertical border inside row 0
            for i in range(n_rows):
                if merged_first_row and i == 0 and 0 < j < 2:
                    continue
                shapes.append({"kind": "stroke",
                               "bbox": [xx - 0.35, ys[i], xx + 0.35, ys[i + 1]],
                               "color": 0, "width": 0.7})
        for i, row in enumerate(rows):
            for j, cell in enumerate(row):
                if merged_first_row and i == 0 and j == 1:
                    continue
                parts = cell.split("/") if (wrap_cells and "/" in cell) else [cell]
                for k, part in enumerate(parts):
                    cy = ys[i] + 3 + k * LINE_H
                    cx = xs[j] + 3
                    w = len(part) * self._char_w()
                    bbox = [cx, cy, cx + w, cy + self.size + 1]
                    self.page["blocks"].append({
                        "type": 0, "bbox": bbox,
                        "lines": [{"bbox": bbox, "dir": [1.0, 0.0], "spans": [
                            {"text": part, "bbox": bbox, "font": self.font,
                             "size": self.size, "flags": 0}]}],
                    })
        self.y = ys[-1] + LINE_H

    def finalize(self, header: Optional[str] = None, footer: bool = False,
                 fonts: Optional[dict] = None) -> str:
        if header or footer:
            for i, page in enumerate(self.pages):
                if header:
                    w = len(header) * self._char_w(9.0)
                    bbox = [MARGIN, 30.0, MARGIN + w, 40.0]
                    page["blocks"].insert(0, {
                        "type": 0, "bbox": bbox,
                        "lines": [{"bbox": bbox, "dir": [1.0, 0.0], "spans": [
                            {"text": header, "bbox": bbox, "font": self.font,
                             "size": 9.0, "flags": 0}]}],
                    })
                if footer:
                    txt = f"Page {i + 1}"
                    w = len(txt) * self._char_w(9.0)
                    bbox = [(PAGE_W - w) / 2, 760.0, (PAGE_W + w) / 2, 770.0]
                    page["blocks"].append({
                        "type": 0, "bbox": bbox,
                        "lines": [{"bbox": bbox, "dir": [1.0, 0.0], "spans": [
                            {"text": txt, "bbox": bbox, "font": self.font,
                             "size": 9.0, "flags": 0}]}],
                    })
        doc = {"pages": self.pages}
        if fonts:
            doc["fonts"] = fonts
        return json.dumps(doc, separators=(",", ":"))


# ---------------- family H: html page with boilerplate ----------------

def gen_htmllike(r: _Rng) -> str:
    """Web-page payload: real main content wrapped in randomized boilerplate
    (head/style/script, nav, banners, sidebars, footers, hidden elements) —
    exercises the htmllike boilerplate-strip + DOM-heuristics extractor."""
    out = ["<!DOCTYPE html><html><head>",
           f"<title>{_esc(r.words(3).title())}</title>",
           "<style>body { margin: 0; } /* <p> inside css */</style>"]
    if r.rng.rand() < 0.6:
        out.append('<script>var a = 1; if (a < 2) { document.title = "x"; }'
                   "</script>")
    out.append("</head><body>")
    if r.rng.rand() < 0.7:
        items = "".join(f'<li><a href="/{w}">{_esc(w)}</a></li>'
                        for w in r.words(3).split())
        out.append(f"<nav><ul>{items}</ul></nav>")
    if r.rng.rand() < 0.4:
        out.append(f"<header><h1>{_esc(r.words(2).upper())}</h1></header>")
    if r.rng.rand() < 0.4:
        out.append(f'<div class="sidebar"><p>{_esc(r.sentence(4, 8))}</p></div>')
    if r.rng.rand() < 0.3:
        out.append(f'<div style="display:none">{_esc(r.words(4))}</div>')

    out.append("<article>")
    out.append(f"<h1>{_esc(r.words(3).title())}</h1>")
    for _ in range(int(r.rng.randint(1, 3))):
        out.append(f"<p>{_esc(r.sentence(8, 18))} &amp; {_esc(r.words(2))}"
                   f" &#8212; {_esc(r.words(1))}.</p>")
    if r.rng.rand() < 0.6:
        out.append(f"<h2>{_esc(r.words(2).title())}</h2>")
        out.append(f"<p>{_esc(r.sentence(6, 12))}</p>")
        if r.rng.rand() < 0.5:
            lis = "".join(f"<li>{_esc(r.words(int(r.rng.randint(1, 4))))}</li>"
                          for _ in range(int(r.rng.randint(2, 5))))
            out.append(f"<ul>{lis}</ul>")
    if r.rng.rand() < 0.35:
        n_cols = int(r.rng.randint(2, 4))
        head_cells = "".join(f"<th>{_esc(r.words(1))}</th>" for _ in range(n_cols))
        rows = [f"<tr>{head_cells}</tr>"]
        for _ in range(int(r.rng.randint(1, 4))):
            cells = "".join(f"<td>{_esc(r.words(int(r.rng.randint(1, 3))))}</td>"
                            for _ in range(n_cols))
            rows.append(f"<tr>{cells}</tr>")
        out.append("<table>" + "".join(rows) + "</table>")
    if r.rng.rand() < 0.2:
        out.append(f"<pre>code {{\n  {_esc(r.words(2))}\n}}</pre>")
    out.append("</article>")
    if r.rng.rand() < 0.7:
        out.append(f'<footer>&copy; 2026 {_esc(r.words(1))} '
                   f'<a href="/p">Privacy</a></footer>')
    out.append("</body></html>")
    return "".join(out)


def gen_pdflike_stream(r: _Rng) -> str:
    """Glyph documents exercising the STREAM (borderless) table stack —
    P16 (tables.parse_stream_tables): candidate collection, the
    simple-structure veto, virtual-border finalization, merged stream
    cells (row- and column-spans), lattice/stream coexistence (the
    determined-stroke skip, reference Border.py:302-316), and the ≤2-column
    layout rebuild. Parsed with ``parse_stream_table=True`` by the
    pdflike_extract_stream gate (reference flag
    services/parse_manager.py:572-578)."""
    ts = _Typesetter()
    scenario = int(r.rng.randint(0, 6))
    xs = [MARGIN, MARGIN + 150.0, MARGIN + 300.0]

    def grid_cell(text: str, col: int, y: float):
        ts.line(text, xs[col], y=y)

    if scenario == 0:
        # plain borderless grid (3 cols — never "simple structure") between
        # two flow paragraphs
        ts.paragraph(r.sentence(18, 30))
        ts.y += 6.0
        top = ts.y
        n_rows = int(r.rng.randint(3, 5))
        for i in range(n_rows):
            for j in range(3):
                grid_cell(r.words(1), j, top + i * 28.0)
        ts.y = top + n_rows * 28.0 + 8.0
        ts.paragraph(r.sentence(15, 25))
        return ts.finalize()
    if scenario == 1:
        # rowspan: outer columns carry 3 rows; the middle column is ONE
        # tall cell (missing inner h-borders → merged stream cell)
        ts.paragraph(r.sentence(12, 20))
        ts.y += 6.0
        top = ts.y
        for i in range(3):
            grid_cell(r.words(1), 0, top + i * 28.0)
            grid_cell(r.words(1), 2, top + i * 28.0)
        grid_cell(r.words(1), 1, top + 28.0)
        ts.y = top + 3 * 28.0 + 8.0
        ts.paragraph(r.sentence(12, 20))
        return ts.finalize()
    if scenario == 2:
        # colspan: a wide middle-row line spans columns 1-2 (its width
        # reaches past x of column 2, so the columns merge at the top
        # recursion level and the uncovered rows re-split → colspan cell);
        # row 0's right cell is staggered so aligned rows != physical rows
        # and the simple-structure veto passes
        top = 120.0
        for i in (0, 2):
            grid_cell(r.words(1), 0, top + i * 30.0)
            grid_cell(r.words(1), 1, top + i * 30.0)
        ts.line(r.words(1), xs[2], y=top + 6.0)
        ts.line(r.words(1), xs[2], y=top + 60.0)
        grid_cell(r.words(1), 0, top + 30.0)
        wide = r.words(2)
        while len(wide) * ts._char_w() < 195.0:   # must end past xs[2]
            wide += " " + r.words(1)
        ts.line(wide, xs[1], y=top + 30.0)
        ts.y = top + 3 * 30.0 + 8.0
        ts.paragraph(r.sentence(12, 20))
        return ts.finalize()
    if scenario == 3:
        # a ruled (lattice) table ABOVE a borderless grid: the lattice's
        # strokes are determined and must not finalize the stream region's
        # virtual borders
        ts.paragraph(r.sentence(10, 16))
        ts.table([["h1", "h2"], [r.words(1), r.words(1)]])
        ts.y += 10.0
        top = ts.y
        for i in range(3):
            for j in range(3):
                grid_cell(r.words(1), j, top + i * 28.0)
        ts.y = top + 3 * 28.0 + 8.0
        ts.paragraph(r.sentence(10, 16))
        return ts.finalize()
    if scenario == 4:
        # two-column staggered layout: rebuilds as a single 1×2 stream row
        # (≤2 columns → reference-only h-borders)
        ts.paragraph(r.sentence(10, 16))
        ts.y += 6.0
        top = ts.y
        for i in range(2):
            ts.line(r.words(2), MARGIN, y=top + i * 22.0)
            ts.line(r.words(2), MARGIN + 268.0, y=top + i * 22.0 + 8.0)
        ts.y = top + 2 * 22.0 + 16.0
        ts.paragraph(r.sentence(10, 16))
        return ts.finalize()
    # scenario 5 — negative: an aligned two-column paragraph pair is simple
    # structure (veto) and must stay plain text
    ts.paragraph(r.sentence(10, 16))
    ts.y += 6.0
    top = ts.y
    for i in range(3):
        ts.line(r.words(3), MARGIN, y=top + i * LINE_H)
        ts.line(r.words(3), MARGIN + 268.0, y=top + i * LINE_H)
    ts.y = top + 3 * LINE_H + 8.0
    ts.paragraph(r.sentence(10, 16))
    return ts.finalize()


# bump when payload generation OR parser semantics change: cached corpora
# under /tmp carry expected outputs computed by the parser at generation
# time, so stale expectations never leak across versions
GEN_VERSION = 12


def gen_pdflike(r: _Rng) -> str:
    ts = _Typesetter()
    scenario = r.rng.randint(0, 8)
    titles = [r.words(2).title() for _ in range(3)]

    if scenario == 7:
        # floating image overlapping a paragraph (P5) + an isolated inline
        # image below the text
        for _ in range(3):
            ts.paragraph(r.sentence(20, 35))
        ts.image(150.0, 120.0, 180.0, 90.0)       # overlaps the flow text
        ts.y += 10.0
        ts.image(MARGIN, ts.y, 120.0, 60.0)       # isolated: stays inline
        ts.y += 70.0
        ts.paragraph(r.sentence(15, 25))
        # standalone type-1 image block with a Figure caption beneath it
        # (ImageSpanExtend caption search) — fixed geometry/text so the
        # rng draw sequence of every other scenario is untouched
        ts._ensure_room(140.0)
        ts.image_block(MARGIN, ts.y, 200.0, 100.0)
        ts.y += 108.0
        ts.line("Figure 1 stub payload illustration", MARGIN)
        ts.y += 6.0
        # below the 28 px OCR minimum: provider uploads but skips OCR
        ts._ensure_room(40.0)
        ts.image_block(MARGIN, ts.y, 20.0, 20.0)
        ts.y += 30.0
        # P26: a diagonal-stamp watermark plus a DRAFT stamp artifact —
        # the watermark's presence strips BOTH at load (converter.py
        # quirk: every /Artifact goes once /Subtype/Watermark is seen)
        ts.artifact("CONFIDENTIAL", "Watermark")
        ts.artifact("DRAFT", "Stamp", x0=400.0, y0=60.0, size=20.0)
        return ts.finalize()

    if scenario == 0:
        # multi-page article with headers + footers (frequency vote needs
        # count ≥2 and rate ≥0.4 — Pages.py:21-22 — so ≥2 pages); carries an
        # embedded-font table exercising P6 enrichment
        ts.font = "BCDGEE+Helvetica-Bold"
        ts.title(r.words(3).title())
        for _ in range(int(r.rng.randint(14, 22))):
            ts.paragraph(r.sentence(30, 60))
        return ts.finalize(header="ACME Quarterly Report", footer=True,
                           fonts={"BCDGEE+Helvetica-Bold":
                                  {"name": "Helvetica", "ratio": 1.15}})
    if scenario == 1:
        # TOC + titled sections
        ts.toc(titles)
        for t in titles:
            ts._ensure_room(LINE_H * 4)
            ts.line(t, MARGIN, size=14.0, flags=16)
            ts.y += 4.0
            ts.paragraph(r.sentence(25, 45))
        return ts.finalize()
    if scenario == 2:
        # ordered + unordered lists under a paragraph; styled lines (P22);
        # plus a PDF-bookmark title (P10): a body-sized line promoted to
        # Title ONLY because the payload's toc names it
        ts.paragraph(r.sentence(20, 35))
        ts.style_last_line("underline")
        ts.list_items([r.words(4) for _ in range(3)], ordered=True)
        ts._ensure_room(LINE_H * 2)
        ts.line(titles[0], MARGIN, size=10.5, flags=0)
        ts.y += 4.0
        ts.paragraph(r.sentence(15, 25))
        ts.style_last_line("highlight")
        ts.list_items([r.words(3) for _ in range(2)], ordered=False)
        doc = json.loads(ts.finalize())
        doc["toc"] = [[1, titles[0], 1]]
        return json.dumps(doc, separators=(",", ":"))
    if scenario == 3:
        # ruled table with merged cell + a wrapped two-line cell (P17),
        # caption + later reference
        ts.paragraph(r.sentence(20, 35))
        ts.table([["h1", "h2", "h3"],
                  [r.words(1) + "/" + r.words(1), r.words(1), r.words(1)],
                  [r.words(1), r.words(1), r.words(1)]],
                 caption="表 1 " + r.words(2), merged_first_row=True,
                 wrap_cells=True)
        ts.paragraph("As shown in 表 1 the results " + r.sentence(10, 20))
        return ts.finalize(footer=True)
    if scenario == 4:
        # mixed layout with mid-page column switches (P12): full-width
        # intro → two-column body → full-width outro
        ts.paragraph(r.sentence(18, 30))
        col_w = (PAGE_W - 2 * MARGIN - 30) / 2
        left_x, right_x = MARGIN, MARGIN + col_w + 30
        y_top = ts.y
        y_end = y_top
        for x0 in (left_x, right_x):
            ts.y = y_top
            for _ in range(2):
                ts.paragraph(r.sentence(18, 30), x0=x0, width=col_w)
            y_end = max(y_end, ts.y)
        ts.y = y_end + 4.0
        ts.paragraph(r.sentence(18, 30))
        return ts.finalize()
    if scenario == 5:
        # hyphenated line breaks + multi-page paragraph continuation
        # (exercises P23 hyphen/space fixup and R4 continuation chains)
        words = ("contin-uation hyphen-ated exper-iment trans-action "
                 "oper-ation").split()
        for _ in range(int(r.rng.randint(10, 16))):
            body = r.sentence(25, 45)
            if r.rng.rand() < 0.5:
                body += " " + words[int(r.rng.randint(0, len(words)))]
            ts.paragraph(body)
        return ts.finalize(footer=True)
    # scenario 6: sparse cover-like first page, then dense body pages
    ts.y = 320.0
    ts.title(r.words(2).title(), size=20.0)
    ts._new_page()
    for _ in range(int(r.rng.randint(8, 14))):
        ts.paragraph(r.sentence(25, 45))
    ts._ensure_room()
    ts._new_page()
    ts.paragraph(r.sentence(25, 45))
    return ts.finalize()


