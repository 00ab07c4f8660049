"""Excel destination (engine/excel_dest.go:10-166).

Reference semantics: write rows into a declared sheet range
(bounds-checked, ≤1 wildcard), optional TRANSPOSE (fill columns
instead of rows), optional TEMPLATE file copied then filled,
OVERWRITE guard, optional COLUMNS re-projection by name.

Concurrent-writer coordination (engine/excel_source.go:37-93): the
reference keeps ONE in-memory workbook per filename in a process-wide
``excelFileManager`` so that multiple destinations building the same
spreadsheet each make incremental progress under a per-file lock
instead of clobbering each other's saves. ``ExcelFileManager`` below
is that singleton: registered paths accumulate cells across writers;
``save`` serializes the merged state. Cell-range layout and the
manager are driver-side pure Python (fully tested); only ``save``
needs openpyxl (absent in this container — import-gated)."""

from __future__ import annotations

import os
import shutil
import threading

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


class _ManagedWorkbook:
    """In-memory workbook: sheet name → {(col, row): value}, guarded
    by its own lock so writers to different files never serialize on
    each other (excel_source.go:26-29 ``excelFile{sync.Mutex, F}``)."""

    def __init__(self, template: str | None = None):
        self.lock = threading.Lock()
        self.template = template
        self.sheets: dict[str, dict[tuple[int, int], object]] = {}


class ExcelFileManager:
    """Per-filename workbook registry (excel_source.go:37-93).

    ``register`` is idempotent like the reference's; ``use`` applies a
    function to the managed workbook under its per-file lock, which is
    what lets N concurrent destinations interleave increments into one
    spreadsheet. ``save`` writes the merged cells with openpyxl
    (template copied first when one was registered)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._files: dict[str, _ManagedWorkbook] = {}

    def register(
        self,
        path: str,
        template: str | None = None,
        overwrite: bool = True,
    ) -> bool:
        """Idempotent; returns True only for a fresh registration."""
        with self._lock:
            if path in self._files:
                return False
            if (template is None and not overwrite
                    and os.path.exists(path)):
                raise FileExistsError(path)
            self._files[path] = _ManagedWorkbook(template)
            return True

    def is_registered(self, path: str) -> bool:
        with self._lock:
            return path in self._files

    def use(self, path: str, fn):
        with self._lock:
            book = self._files.get(path)
        if book is None:
            raise RuntimeError(
                f"Excel file {path!r} used before register() — "
                "mirror of excel_source.go:88 panic"
            )
        with book.lock:
            return fn(book)

    def write_cells(
        self, path: str, sheet: str,
        cells: dict[tuple[int, int], object],
    ) -> None:
        def _merge(book: _ManagedWorkbook):
            book.sheets.setdefault(sheet, {}).update(cells)

        self.use(path, _merge)

    def cells(self, path: str, sheet: str) -> dict[tuple[int, int], object]:
        return self.use(path, lambda b: dict(b.sheets.get(sheet, {})))

    def save(self, path: str) -> None:
        def _save_openpyxl(book: _ManagedWorkbook):
            if book.template:
                shutil.copyfile(book.template, path)
                wb = openpyxl.load_workbook(path)
            else:
                wb = openpyxl.Workbook()
            for sheet, cells in book.sheets.items():
                ws = (wb[sheet] if sheet in wb.sheetnames
                      else wb.create_sheet(sheet))
                for (x, y), v in cells.items():
                    ws.cell(row=y, column=x, value=v)
            wb.save(path)

        def _save_stdlib(book: _ManagedWorkbook):
            # dependency-free path: merge template VALUES (via the
            # stdlib reader; styles/formulas are not carried) under the
            # accumulated cells, then emit a fresh workbook
            from analyst_spark.sources.excel import (
                list_sheets_stdlib,
                load_matrix_stdlib,
            )

            sheets: dict[str, dict] = {}
            if book.template:
                for name in list_sheets_stdlib(book.template):
                    matrix = load_matrix_stdlib(book.template, name)
                    sheets[name] = {
                        (x + 1, y + 1): v
                        for y, row in enumerate(matrix)
                        for x, v in enumerate(row)
                        if v is not None
                    }
            for sheet, cells in book.sheets.items():
                sheets.setdefault(sheet, {}).update(cells)
            write_workbook_stdlib(path, sheets)

        self.use(path, _save_openpyxl if openpyxl is not None else _save_stdlib)

    def discard(self, path: str) -> None:
        with self._lock:
            self._files.pop(path, None)

    def reset(self) -> None:
        with self._lock:
            self._files.clear()


#: process-wide singleton, like the reference's ``fileManager``
#: (excel_source.go:17,22-24 init())
FILE_MANAGER = ExcelFileManager()


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
    manager: ExcelFileManager | None = None,
    save: bool = True,
) -> None:
    """Write ``df`` into the workbook at ``path`` via the file
    manager. A standalone call (path not yet registered) registers,
    writes, saves, and discards — the single-writer behavior. Inside
    a job, the engine registers the path first and passes
    ``save=False``; each block's cells then accumulate in the shared
    in-memory workbook and the engine saves once at job end
    (excel_dest.go:153-163 saves at destination close — with a shared
    workbook the final save carries every writer's cells)."""
    mgr = manager or FILE_MANAGER
    if columns:
        df = df.select(*columns)
    rows = [list(r) for r in df.limit(max_rows + 1).collect()]
    if len(rows) > max_rows:
        raise ValueError("row count guard exceeded for excel sink")
    standalone = mgr.register(path, template=template, overwrite=overwrite)
    mgr.write_cells(path, sheet, layout_cells(rows, rng, transpose))
    if save or standalone:
        try:
            mgr.save(path)
        finally:
            if standalone:
                mgr.discard(path)


# ----------------------------------------------- stdlib xlsx writer

def _col_letters(n: int) -> str:
    s = ""
    while n > 0:
        n, r = divmod(n - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def write_workbook_stdlib(path: str, sheets: dict[str, dict]) -> None:
    """Minimal XLSX writer on zipfile + handwritten XML — the
    complement of sources.excel.load_matrix_stdlib. Values: bools as
    t=\"b\", ints/floats as numbers, everything else as inline
    strings. ``sheets`` maps sheet name -> {(x, y): value} with the
    same 1-based (col, row) addressing layout_cells produces."""
    import math
    import zipfile
    from xml.sax.saxutils import escape, quoteattr

    def sheet_xml(cells: dict) -> str:
        rows: dict[int, dict[int, object]] = {}
        for (x, y), v in cells.items():
            rows.setdefault(y, {})[x] = v
        body = []
        for y in sorted(rows):
            cs = []
            for x in sorted(rows[y]):
                v = rows[y][x]
                ref = f"{_col_letters(x)}{y}"
                if isinstance(v, bool):
                    cs.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
                elif isinstance(v, (int, float)) and (
                    not isinstance(v, float) or math.isfinite(v)
                ):
                    cs.append(f'<c r="{ref}"><v>{v}</v></c>')
                elif v is None:
                    continue
                else:
                    cs.append(
                        f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                        f"{escape(str(v))}</t></is></c>"
                    )
            body.append(f'<row r="{y}">{"".join(cs)}</row>')
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )

    names = list(sheets) or ["Sheet1"]
    sheet_entries = "".join(
        f'<sheet name={quoteattr(name)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
        'package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + overrides
        + "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        for i, name in enumerate(names):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                sheet_xml(sheets.get(name, {})),
            )
