"""Lattice (ruled) table detection from border strokes.

Parity target: the grid subset of the reference's table stack
(/root/reference/doc_parser/dom_parser/parsers/pdf/table/TablesConstructor.py:42-103
and table/TableStructure.py — stroke bucketing into h/v rulings, lattice
cells, merged-cell detection from missing inner borders, line→cell
assignment). Stream (borderless) tables are intentionally not implemented:
``parse_stream_table=False`` is the reference's production default
(services/parse_manager.py:572-578).

The implementation is a NumPy grid walk sized for per-turn documents; it
runs entirely inside the Arrow UDF.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from bella_domify_spark.core.blocks import Cell, Line, TableBlock
from bella_domify_spark.parsers.pdflike.cluster import sort_in_reading_order_plus
from bella_domify_spark.parsers.pdflike.glyphdoc import RawPage, Stroke

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
                lines = cell_lines.get((cell.start_row, cell.start_col), [])
                ordered = sort_in_reading_order_plus(lines)
                cell.text = "".join(l.text for l in ordered)

        tables.append(TableBlock(rows=cell_rows, bbox=bbox, page_num=[page.page_id]))

    if consumed_ids:
        page.lines = [l for l in page.lines if id(l) not in consumed_ids]
    return tables
