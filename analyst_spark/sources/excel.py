"""Excel (XLSX) source (engine/excel_source.go:107-272).

Reference semantics: read range ``A1:B*`` (one wildcard allowed) from
a sheet; optional first-row headers; per-cell coercion
int → float → bool → time → string; wildcard stops at first empty row.

Excel files are driver-scale artifacts by nature (the reference
reads them whole into memory too), so this is a driver-side shim →
``createDataFrame``. openpyxl is not installed in this container —
the parsing core is implemented against a cell-matrix abstraction and
fully tested; only the workbook loader needs openpyxl.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from analyst_spark.sources.literal import _frame

try:
    import openpyxl
except ImportError:  # pragma: no cover — not in this container
    openpyxl = None

_RANGE_RE = re.compile(r"^([A-Z]+)(\d+|\*):([A-Z]+)(\d+|\*)$")


def col_to_index(letters: str) -> int:
    """'A' -> 1, 'AB' -> 28 (aql/parser.go:379-463 range grammar)."""
    n = 0
    for ch in letters.upper():
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


def parse_range(rng: str) -> tuple[int, int | None, int, int | None]:
    """Returns (x1, y1, x2, y2); a '*' row is None. At most one
    wildcard, only in the row coordinates (excel_source.go range
    rules)."""
    m = _RANGE_RE.match(rng.replace(" ", "").upper())
    if not m:
        raise ValueError(f"invalid range {rng!r}")
    c1, r1, c2, r2 = m.groups()
    y1 = None if r1 == "*" else int(r1)
    y2 = None if r2 == "*" else int(r2)
    if y1 is None and y2 is None:
        raise ValueError("at most one wildcard allowed in range")
    return col_to_index(c1), y1, col_to_index(c2), y2


def coerce_cell(v):
    """int → float → bool → time → string (excel_source.go:226-272)."""
    if v is None or isinstance(v, (int, float, bool, datetime)):
        return v
    s = str(v)
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%d"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            pass
    return s


def matrix_to_rows(
    cells: list[list],
    rng: str,
    header_row: bool = True,
    columns: list[str] | None = None,
) -> tuple[list[str], list[list]]:
    """Extract (columns, rows) from a 0-indexed cell matrix according
    to the reference's range + wildcard + header semantics."""
    x1, y1, x2, y2 = parse_range(rng)
    y1 = y1 or 1
    rows = []
    names = columns
    y = y1
    while True:
        if y2 is not None and y > y2:
            break
        if y - 1 >= len(cells):
            break
        raw = [
            cells[y - 1][x - 1] if x - 1 < len(cells[y - 1]) else None
            for x in range(x1, x2 + 1)
        ]
        if y2 is None and all(v is None or v == "" for v in raw):
            break  # wildcard stops at first empty row
        if y == y1 and header_row:
            names = [str(v) for v in raw]
        else:
            rows.append([coerce_cell(v) for v in raw])
        y += 1
    if names is None:
        names = [f"col{i}" for i in range(1, x2 - x1 + 2)]
    return names, rows


def excel_source(
    spark: SparkSession,
    path: str,
    sheet: str,
    rng: str,
    header_row: bool = True,
    columns: list[str] | None = None,
) -> DataFrame:
    if openpyxl is not None:
        wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
        ws = wb[sheet]
        cells = [[c.value for c in row] for row in ws.iter_rows()]
    else:
        # no third-party dependency needed: the stdlib reader below
        # handles the reference's own fixtures (shared/inline strings,
        # numbers, booleans)
        cells = load_matrix_stdlib(path, sheet)
    names, rows = matrix_to_rows(cells, rng, header_row, columns)
    return _frame(spark, rows, names)


# ----------------------------------------------- stdlib xlsx reader

_XMLNS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELNS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
          "relationships}id")


def _cell_ref_to_rc(ref: str) -> tuple[int, int]:
    m = re.match(r"([A-Z]+)(\d+)", ref)
    return int(m.group(2)), col_to_index(m.group(1))


def load_matrix_stdlib(path: str, sheet: str) -> list[list]:
    """Minimal XLSX reader on zipfile + ElementTree — no third-party
    dependency, enough for the reference's fixtures and typical data
    sheets: shared/inline/formula-cached strings, numbers (ints kept
    integral, matching the reference's coercion order
    engine/excel_source.go:197-235), booleans. Returns a dense
    row-major matrix with None for absent cells."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        # sheet name -> target via workbook.xml + its rels
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_map = {
            r.get("Id"): r.get("Target")
            for r in rels
        }
        target = None
        for sh in wb.iter(f"{_XMLNS}sheet"):
            if sh.get("name") == sheet:
                target = rel_map[sh.get(_RELNS)]
                break
        if target is None:
            raise KeyError(f"sheet {sheet!r} not in workbook")
        if not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_XMLNS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_XMLNS}t"))
                )
        ws = ET.fromstring(z.read(target))
        cells: dict[tuple[int, int], object] = {}
        maxr = maxc = 0
        for c in ws.iter(f"{_XMLNS}c"):
            ref = c.get("r")
            if not ref:
                continue
            r, col = _cell_ref_to_rc(ref)
            t = c.get("t", "n")
            v = c.find(f"{_XMLNS}v")
            if t == "inlineStr":
                is_el = c.find(f"{_XMLNS}is")
                val = (
                    "".join(x.text or "" for x in is_el.iter(f"{_XMLNS}t"))
                    if is_el is not None
                    else None
                )
            elif v is None or v.text is None:
                val = None
            elif t == "s":
                val = shared[int(v.text)]
            elif t == "b":
                val = v.text == "1"
            elif t == "str":
                val = v.text
            else:  # numeric
                f = float(v.text)
                val = int(f) if f.is_integer() else f
            if val is not None:
                cells[(r, col)] = val
                maxr, maxc = max(maxr, r), max(maxc, col)
        return [
            [cells.get((r, col)) for col in range(1, maxc + 1)]
            for r in range(1, maxr + 1)
        ]


def list_sheets_stdlib(path: str) -> list[str]:
    """Sheet names in workbook order (stdlib reader companion)."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [sh.get("name") for sh in wb.iter(f"{_XMLNS}sheet")]
