"""Excel destination (engine/excel_dest.go:10-166).

Reference semantics: write rows into a declared sheet range
(bounds-checked, ≤1 wildcard), optional TRANSPOSE (fill columns
instead of rows), optional TEMPLATE file copied then filled,
OVERWRITE guard, optional COLUMNS re-projection by name.

Cell-range layout is driver-side pure Python (`layout_cells`, fully
tested); only the workbook writer needs openpyxl (absent in this
container — import-gated)."""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame

from analyst_spark.sources.excel import parse_range

try:
    import openpyxl
except ImportError:  # pragma: no cover — not in this container
    openpyxl = None


def layout_cells(
    rows: list[list],
    rng: str,
    transpose: bool = False,
) -> dict[tuple[int, int], object]:
    """Map rows into (col, row)→value cells for the declared range,
    enforcing the reference's bounds rules (excel_dest.go:117-124):
    fixed ranges must fit the data exactly in the non-wildcard
    dimension; data overflowing a fixed range is an error."""
    x1, y1, x2, y2 = parse_range(rng)
    y1 = y1 or 1
    width = x2 - x1 + 1
    n_cols = len(rows[0]) if rows else 0
    if transpose:
        if width < len(rows):
            raise ValueError("range too narrow for transposed rows")
        if y2 is not None and (y2 - y1 + 1) < n_cols:
            raise ValueError("range too short for transposed columns")
    else:
        if width != n_cols:
            raise ValueError(
                f"range width {width} != row width {n_cols}"
            )
        if y2 is not None and (y2 - y1 + 1) < len(rows):
            raise ValueError("range too short for data")
    cells: dict[tuple[int, int], object] = {}
    for i, row in enumerate(rows):
        for j, v in enumerate(row):
            if transpose:
                cells[(x1 + i, y1 + j)] = v
            else:
                cells[(x1 + j, y1 + i)] = v
    return cells


def excel_sink(
    df: DataFrame,
    path: str,
    sheet: str,
    rng: str,
    transpose: bool = False,
    template: str | None = None,
    overwrite: bool = True,
    columns: list[str] | None = None,
    max_rows: int = 1_000_000,
) -> None:
    if openpyxl is None:
        raise ImportError(
            "openpyxl is not installed; excel_sink requires it "
            "(cell layout core is layout_cells, tested independently)"
        )
    if columns:
        df = df.select(*columns)
    rows = [list(r) for r in df.limit(max_rows + 1).collect()]
    if len(rows) > max_rows:
        raise ValueError("row count guard exceeded for excel sink")
    if template:
        shutil.copyfile(template, path)
        wb = openpyxl.load_workbook(path)
    else:
        import os

        if os.path.exists(path) and not overwrite:
            raise FileExistsError(path)
        wb = openpyxl.Workbook()
    ws = wb[sheet] if sheet in wb.sheetnames else wb.create_sheet(sheet)
    for (x, y), v in layout_cells(rows, rng, transpose).items():
        ws.cell(row=y, column=x, value=v)
    wb.save(path)
