"""Lattice (ruled) and stream (borderless) table detection.

Parity targets in the reference's table stack:
- Lattice: the grid subset of
  /root/reference/doc_parser/dom_parser/parsers/pdf/table/TablesConstructor.py:42-103
  and table/TableStructure.py — stroke bucketing into h/v rulings, lattice
  cells, merged-cell detection from missing inner borders, line→cell
  assignment.
- Stream: TablesConstructor.py:106-227 + layout/Blocks.py:189-262 —
  candidate regions from non-flow rows (``collect_stream_lines`` with the
  ``is_flow_layout`` test, common/Collection.py:305-323), the
  simple-structure veto (TablesConstructor.py:210-222), and virtual borders
  from column/row gaps (``_inner_borders``, TablesConstructor.py:294-381).
  Subset: aligned MxN grids (the recursion for per-column independent row
  structures and merged stream cells is not ported). Gated behind
  ``parse_stream_table`` which defaults to False exactly like production
  (services/parse_manager.py:572-578).

The implementation is a NumPy grid walk sized for per-turn documents; it
runs entirely inside the Arrow UDF.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from bella_domify_spark.core.blocks import Cell, Line, TableBlock
from bella_domify_spark.parsers.pdflike.cluster import (
    group_physical_rows,
    sort_in_reading_order_plus,
)
from bella_domify_spark.parsers.pdflike.glyphdoc import RawPage, Stroke
from bella_domify_spark.parsers.pdflike.sections import (
    _bbox,
    group_by_columns,
    group_by_rows,
)

LINE_SEPARATE_THRESHOLD = 5.0  # reference config.py:32

_TOL = 1.5  # ruling snap tolerance in points


def _is_horizontal(s: Stroke) -> bool:
    return (s.y1 - s.y0) <= (s.x1 - s.x0)


def _cluster_strokes(strokes: List[Stroke]) -> List[List[Stroke]]:
    """Connected components of strokes whose bboxes touch (tolerance _TOL) —
    the reference groups border shapes by connectivity
    (TablesConstructor.py:42-60, Collection.py:131-167)."""
    n = len(strokes)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[rj] = ri

    for i in range(n):
        a = strokes[i]
        for j in range(i + 1, n):
            b = strokes[j]
            if a.x0 - _TOL <= b.x1 and b.x0 - _TOL <= a.x1 and \
                    a.y0 - _TOL <= b.y1 and b.y0 - _TOL <= a.y1:
                union(i, j)
    groups: dict = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(strokes[i])
    return list(groups.values())


def _snap(values: List[float]) -> List[float]:
    """Collapse near-equal coordinates into grid boundaries."""
    out: List[float] = []
    for v in sorted(values):
        if not out or v - out[-1] > _TOL:
            out.append(v)
    return out


def _covers(strokes: List[Stroke], horizontal: bool, fixed: float,
            lo: float, hi: float) -> bool:
    """Is there a ruling at coordinate ``fixed`` spanning [lo, hi]?"""
    mid = (lo + hi) / 2.0
    for s in strokes:
        if horizontal != _is_horizontal(s):
            continue
        if horizontal:
            y = (s.y0 + s.y1) / 2.0
            if abs(y - fixed) <= _TOL and s.x0 - _TOL <= mid <= s.x1 + _TOL:
                return True
        else:
            x = (s.x0 + s.x1) / 2.0
            if abs(x - fixed) <= _TOL and s.y0 - _TOL <= mid <= s.y1 + _TOL:
                return True
    return False


def _build_grid(strokes: List[Stroke]) -> Optional[Tuple[List[float], List[float]]]:
    hs = [s for s in strokes if _is_horizontal(s)]
    vs = [s for s in strokes if not _is_horizontal(s)]
    if len(hs) < 2 or len(vs) < 2:
        return None
    rows = _snap([(s.y0 + s.y1) / 2.0 for s in hs])
    cols = _snap([(s.x0 + s.x1) / 2.0 for s in vs])
    if len(rows) < 2 or len(cols) < 2:
        return None
    return rows, cols


def _cell_text(lines: List[Line]) -> str:
    """Recursive cell layout, text level (P17 — table/Cell.py:27-32 +
    TableBlock.parse :145-154): a cell runs the same paragraph pipeline as a
    page column (reading order → paragraph join → split → hyphen/space
    fixup) and joins its blocks with newlines. Nested tables inside cells
    are not ported (the synthetic payload model has no nested rulings)."""
    if not lines:
        return ""
    from bella_domify_spark.parsers.pdflike import pipeline
    from bella_domify_spark.parsers.pdflike.paragraphs import (
        adjust_last_word,
        join_lines_vertically,
    )

    ordered = sort_in_reading_order_plus(lines)
    blocks = pipeline._split_blocks(join_lines_vertically(ordered))
    for b in blocks:
        adjust_last_word(b.lines, delete_end_line_hyphen=True)
    return "\n".join(b.text for b in blocks)


def parse_lattice_tables(page: RawPage) -> List[TableBlock]:
    """Detect lattice tables on a page; consumes the lines that fall inside a
    table region (they are removed from ``page.lines``)."""
    if not page.strokes:
        return []
    tables: List[TableBlock] = []
    consumed_ids = set()

    for group in _cluster_strokes(page.strokes):
        grid = _build_grid(group)
        if grid is None:
            continue
        rows, cols = grid
        n_rows, n_cols = len(rows) - 1, len(cols) - 1
        if n_rows < 1 or n_cols < 1:
            continue

        # merged-cell map: covered[i][j] = True once assigned to a cell
        covered = np.zeros((n_rows, n_cols), dtype=bool)
        cell_rows: List[List[Cell]] = [[] for _ in range(n_rows)]
        for i in range(n_rows):
            for j in range(n_cols):
                if covered[i][j]:
                    continue
                # expand right while the inner vertical border is missing
                end_col = j
                while end_col + 1 < n_cols and not covered[i][end_col + 1] and \
                        not _covers(group, horizontal=False, fixed=cols[end_col + 1],
                                    lo=rows[i], hi=rows[i + 1]):
                    end_col += 1
                # expand down while the inner horizontal border is missing
                # across the whole [j, end_col] width
                end_row = i
                while end_row + 1 < n_rows and all(
                        not covered[end_row + 1][k] for k in range(j, end_col + 1)) and all(
                        not _covers(group, horizontal=True, fixed=rows[end_row + 1],
                                    lo=cols[k], hi=cols[k + 1])
                        for k in range(j, end_col + 1)):
                    end_row += 1
                covered[i:end_row + 1, j:end_col + 1] = True
                cell_rows[i].append(Cell(text="", start_row=i, end_row=end_row,
                                         start_col=j, end_col=end_col))

        # assign lines to cells by center containment (Blocks.py:164-187)
        bbox = (cols[0], rows[0], cols[-1], rows[-1])
        cell_lines: dict = {}
        for line in page.lines:
            cx = (line.bbox[0] + line.bbox[2]) / 2.0
            cy = (line.bbox[1] + line.bbox[3]) / 2.0
            if not (bbox[0] - _TOL <= cx <= bbox[2] + _TOL and
                    bbox[1] - _TOL <= cy <= bbox[3] + _TOL):
                continue
            consumed_ids.add(id(line))
            for r in cell_rows:
                placed = False
                for cell in r:
                    if cols[cell.start_col] - _TOL <= cx <= cols[cell.end_col + 1] + _TOL and \
                            rows[cell.start_row] - _TOL <= cy <= rows[cell.end_row + 1] + _TOL:
                        cell_lines.setdefault((cell.start_row, cell.start_col), []).append(line)
                        placed = True
                        break
                if placed:
                    break

        for r in cell_rows:
            for cell in r:
                cell.text = _cell_text(
                    cell_lines.get((cell.start_row, cell.start_col), []))

        tables.append(TableBlock(rows=cell_rows, bbox=bbox, page_num=[page.page_id]))

    if consumed_ids:
        page.lines = [l for l in page.lines if id(l) not in consumed_ids]
    return tables


# ---------------------------------------------------------------------------
# Stream (borderless) tables — P16
# ---------------------------------------------------------------------------

def _is_flow_layout(row: List[Line],
                    threshold: float = LINE_SEPARATE_THRESHOLD) -> bool:
    """Collection.is_flow_layout (Collection.py:305-323), horizontal text:
    single column → flow; multiple x-columns → not flow; a gap ≥ threshold
    inside a physical row → not flow. Element order within physical rows
    follows input order, as in the reference."""
    if len(row) <= 1:
        return True
    if len(group_by_columns(row)) > 1:
        return False
    for prow in group_physical_rows(row):
        for a, b in zip(prow, prow[1:]):
            if abs(b.bbox[0] - a.bbox[2]) >= threshold:
                return False
    return True


def collect_stream_lines(lines: List[Line],
                         threshold: float = LINE_SEPARATE_THRESHOLD) -> List[List[Line]]:
    """Blocks.collect_stream_lines (Blocks.py:189-262) without the shading
    path (the glyph payload model has no cell fillings): group page rows,
    accumulate non-flow rows into candidate regions, close a region on a
    flow row or a ≥50 pt vertical gap (gap check runs AFTER the current row
    is accumulated — reference quirk, Blocks.py:253-257)."""
    if not lines:
        return []
    rows = group_by_rows(lines)
    res: List[List[Line]] = []
    cur: List[Line] = []

    def close():
        if cur:
            res.append(list(cur))
            cur.clear()

    ref_pos = _bbox(rows[0])[3]
    for row in rows:
        bb = _bbox(row)
        if not _is_flow_layout(row, threshold):
            cur.extend(row)
        else:
            close()
        if bb[1] - ref_pos >= 50:
            close()
        ref_pos = bb[3]
    close()
    return res


def _is_simple_structure(lines: List[Line]) -> bool:
    """TablesConstructor._is_simple_structure (TablesConstructor.py:210-222):
    one column is flow layout; two columns whose physical rows equal aligned
    rows is a plain paragraph pair."""
    num = len(group_by_columns(lines))
    if num == 1:
        return True
    if num == 2:
        return len(group_physical_rows(lines)) == len(group_by_rows(lines))
    return False


def parse_stream_tables(page: RawPage,
                        threshold: float = LINE_SEPARATE_THRESHOLD) -> List[TableBlock]:
    """Borderless tables from virtual borders at column/row gaps
    (TablesConstructor.stream_tables + _inner_borders subset for aligned
    grids). Consumes the lines placed into table cells. Call AFTER
    parse_lattice_tables so ruled regions are already claimed."""
    cands = collect_stream_lines(page.lines, threshold)
    tables: List[TableBlock] = []
    consumed_ids: set = set()

    for cand in cands:
        if not cand:
            continue
        region = _bbox(cand)
        # explicit strokes inside the region disable the simple-structure
        # veto (TablesConstructor.py:183-185); with none, veto simple shapes
        has_strokes = any(
            s.x0 >= region[0] - _TOL and s.x1 <= region[2] + _TOL and
            s.y0 >= region[1] - _TOL and s.y1 <= region[3] + _TOL
            for s in page.strokes)
        if not has_strokes and _is_simple_structure(cand):
            continue

        cols_lines = group_by_columns(cand)
        n_cols = len(cols_lines)
        if n_cols < 2:
            continue

        # per-column row structure (TablesConstructor._inner_borders
        # :353-358: a column with a single row group contributes NO inner
        # horizontal borders — its cell spans every global row slot)
        col_rows = [group_by_rows(c, factor=0.1) for c in cols_lines]
        bounds: set = set()
        for rows in col_rows:
            for a, b in zip(rows, rows[1:]):
                bounds.add(round((_bbox(a)[3] + _bbox(b)[1]) / 2.0, 3))
        row_bounds = [region[1]] + sorted(bounds) + [region[3]]
        n_rows = len(row_bounds) - 1
        if n_rows < 1:
            continue

        # a column's k-th cell spans the global slots between the column's
        # OWN k-th and (k+1)-th borders (region edges at the extremes) —
        # columns with fewer row groups than the table get rowspans
        rb = np.array(row_bounds)
        cell_rows: List[List[Cell]] = [[] for _ in range(n_rows)]
        for j, rows in enumerate(col_rows):
            own = [region[1]]
            for a, b in zip(rows, rows[1:]):
                own.append(round((_bbox(a)[3] + _bbox(b)[1]) / 2.0, 3))
            own.append(region[3])
            for k, g in enumerate(rows):
                start = int(np.searchsorted(rb, own[k] + 1e-6) - 1)
                end = int(np.searchsorted(rb, own[k + 1] - 1e-6) - 1)
                start = min(max(start, 0), n_rows - 1)
                end = min(max(end, start), n_rows - 1)
                cell_rows[start].append(Cell(text=_cell_text(list(g)),
                                             start_row=start, end_row=end,
                                             start_col=j, end_col=j))
                consumed_ids.update(id(l) for l in g)
        for r in cell_rows:
            r.sort(key=lambda c: c.start_col)

        tables.append(TableBlock(rows=cell_rows, bbox=region,
                                 page_num=[page.page_id], is_stream=True))

    if consumed_ids:
        page.lines = [l for l in page.lines if id(l) not in consumed_ids]
    return tables
