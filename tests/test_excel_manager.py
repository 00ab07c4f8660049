"""Excel file-manager parity (engine/excel_source.go:37-93).

The reference keeps one in-memory workbook per filename behind a
per-file lock so concurrent destinations building one spreadsheet
interleave increments instead of clobbering each other. These tests
drive the pure-Python manager (serialization to .xlsx is the only
openpyxl-gated step) and the AQL job-scope wiring: register on first
write, accumulate across blocks, save-once at job end, discard on
failure."""

import threading

import pytest

from analyst_spark.sinks.excel import ExcelFileManager, excel_sink
from analyst_spark.aql.engine import execute_script


def test_register_idempotent_and_overwrite_guard(tmp_path):
    mgr = ExcelFileManager()
    p = str(tmp_path / "wb.xlsx")
    assert mgr.register(p) is True
    assert mgr.register(p) is False      # idempotent (Register no-op)
    existing = tmp_path / "there.xlsx"
    existing.write_bytes(b"x")
    with pytest.raises(FileExistsError):
        mgr.register(str(existing), overwrite=False)
    # a template implies filling an existing layout — no guard
    assert mgr.register(str(existing), template=str(existing)) is True


def test_use_before_register_raises():
    mgr = ExcelFileManager()
    with pytest.raises(RuntimeError):
        mgr.use("/nope.xlsx", lambda b: None)


def test_cells_merge_across_writers():
    mgr = ExcelFileManager()
    mgr.register("f.xlsx")
    mgr.write_cells("f.xlsx", "S", {(1, 1): "a", (2, 1): "b"})
    mgr.write_cells("f.xlsx", "S", {(1, 2): "c"})          # second block
    mgr.write_cells("f.xlsx", "Other", {(1, 1): 9})        # other sheet
    assert mgr.cells("f.xlsx", "S") == {
        (1, 1): "a", (2, 1): "b", (1, 2): "c"
    }
    assert mgr.cells("f.xlsx", "Other") == {(1, 1): 9}
    mgr.discard("f.xlsx")
    assert not mgr.is_registered("f.xlsx")


def test_concurrent_writers_all_land():
    """N threads writing disjoint rows of one workbook — the per-file
    lock must serialize the merges losslessly (the scenario the
    reference built the manager for)."""
    mgr = ExcelFileManager()
    mgr.register("c.xlsx")

    def write(i):
        mgr.write_cells("c.xlsx", "S", {(1, i + 1): i})

    threads = [threading.Thread(target=write, args=(i,)) for i in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    got = mgr.cells("c.xlsx", "S")
    assert got == {(1, i + 1): i for i in range(32)}


def test_standalone_sink_saves_and_discards(spark, tmp_path, monkeypatch):
    """A bare excel_sink call (no prior registration) must behave like
    the old single-writer path: register, write, save, discard — no
    state leaking into the process-wide manager."""
    import analyst_spark.sinks.excel as ex

    saved = {}
    mgr = ExcelFileManager()
    monkeypatch.setattr(
        ExcelFileManager, "save",
        lambda self, path: saved.update(
            {path: self.use(path, lambda b: {s: dict(c) for s, c in b.sheets.items()})}
        ),
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["n", "s"])
    p = str(tmp_path / "solo.xlsx")
    excel_sink(df.orderBy("n"), p, "S", "A1:B*", manager=mgr)
    assert saved[p]["S"] == {(1, 1): 1, (2, 1): "a", (1, 2): 2, (2, 2): "b"}
    assert not mgr.is_registered(p)


def test_standalone_sink_without_openpyxl_writes_via_stdlib(spark, tmp_path):
    """Saving no longer requires openpyxl: the stdlib writer emits a
    real workbook the stdlib reader can load back."""
    from analyst_spark.sources.excel import load_matrix_stdlib

    mgr = ExcelFileManager()
    df = spark.createDataFrame([(1,), (2,)], ["n"])
    p = str(tmp_path / "no.xlsx")
    excel_sink(df, p, "S", "A1:A*", manager=mgr)
    assert not mgr.is_registered(p)   # standalone sink saves + discards
    assert load_matrix_stdlib(p, "S") == [[1], [2]]


def test_aql_two_blocks_one_workbook(spark, tmp_path, monkeypatch):
    """Two QUERY blocks INTO the same Excel connection: cells from
    both blocks must be in the single job-end save (the reference's
    shared-workbook semantics, not last-write-wins)."""
    import analyst_spark.sinks.excel as ex

    saved = {}
    monkeypatch.setattr(
        ExcelFileManager, "save",
        lambda self, path: saved.update(
            {path: self.use(path, lambda b: {s: dict(c) for s, c in b.sheets.items()})}
        ),
    )
    p = str(tmp_path / "job.xlsx")
    script = f"""
    CONNECTION 'Workbook' ( Driver = 'Excel', File = '{p}' )
    DATA 'Head' ( [["metric", "value"]] )
      WITH (FORMAT='JSON_ARRAY', COLUMNS='a,b')
      INTO CONNECTION Workbook WITH (SHEET='S', RANGE='A1:B1');
    DATA 'Body' ( [[1, 10], [2, 20]] )
      WITH (FORMAT='JSON_ARRAY', COLUMNS='a,b')
      INTO CONNECTION Workbook WITH (SHEET='S', RANGE='A2:B*');
    """
    execute_script(spark, script)
    assert saved[p]["S"] == {
        (1, 1): "metric", (2, 1): "value",
        (1, 2): 1, (2, 2): 10,
        (1, 3): 2, (2, 3): 20,
    }
    assert not ex.FILE_MANAGER.is_registered(p)


def test_aql_failed_job_discards_without_save(spark, tmp_path, monkeypatch):
    saved = []
    monkeypatch.setattr(
        ExcelFileManager, "save",
        lambda self, path: saved.append(path),
    )
    import analyst_spark.sinks.excel as ex

    p = str(tmp_path / "fail.xlsx")
    script = f"""
    CONNECTION 'Workbook' ( Driver = 'Excel', File = '{p}' )
    DATA 'Ok' ( [[1, 10]] )
      WITH (FORMAT='JSON_ARRAY', COLUMNS='a,b')
      INTO CONNECTION Workbook WITH (SHEET='S', RANGE='A1:B*');
    DATA 'Boom' ( [[1]] )
      WITH (FORMAT='JSON_ARRAY', COLUMNS='a')
      INTO CONNECTION Workbook WITH (SHEET='S', RANGE='A1:C1');
    """
    with pytest.raises(ValueError):
        execute_script(spark, script)   # width mismatch in block 2
    assert saved == []                  # failure → no partial file
    assert not ex.FILE_MANAGER.is_registered(p)


def test_failed_save_rolls_back_transaction(spark, tmp_path, monkeypatch):
    """A workbook save error at job end must roll back staged SQL
    writes, not leave them committed (the reference fails the job on
    destination-close errors)."""
    calls = []

    class FakeTx:
        def commit(self):
            calls.append("commit")

        def rollback(self):
            calls.append("rollback")

    monkeypatch.setattr(
        ExcelFileManager, "save",
        lambda self, path: (_ for _ in ()).throw(IOError("disk full")),
    )
    p = str(tmp_path / "boom.xlsx")
    script = f"""
    CONNECTION 'Workbook' ( Driver = 'Excel', File = '{p}' )
    DATA 'D' ( [[1, 10]] )
      WITH (FORMAT='JSON_ARRAY', COLUMNS='a,b')
      INTO CONNECTION Workbook WITH (SHEET='S', RANGE='A1:B*');
    """
    with pytest.raises(IOError):
        execute_script(spark, script, tx_manager=FakeTx())
    assert calls == ["rollback"]


def test_stdlib_xlsx_roundtrip(tmp_path):
    """Dependency-free save: layout cells -> real .xlsx on disk ->
    read back with the stdlib reader, values and types intact."""
    from analyst_spark.sinks.excel import FILE_MANAGER
    from analyst_spark.sources.excel import load_matrix_stdlib

    path = str(tmp_path / "out.xlsx")
    FILE_MANAGER.register(path, template=None)
    FILE_MANAGER.write_cells(
        path,
        "Report",
        {(1, 1): "name", (2, 1): "score", (1, 2): "ada", (2, 2): 42,
         (1, 3): "bob", (2, 3): 2.5, (3, 3): True},
    )
    FILE_MANAGER.save(path)
    FILE_MANAGER.discard(path)
    got = load_matrix_stdlib(path, "Report")
    assert got == [["name", "score", None],
                   ["ada", 42, None],
                   ["bob", 2.5, True]]


def test_stdlib_xlsx_template_merge(tmp_path):
    """TEMPLATE mode without openpyxl: template VALUES survive under
    newly written cells (reference excel_dest TEMPLATE semantics,
    values-only in the dependency-free path)."""
    from analyst_spark.sinks.excel import FILE_MANAGER, write_workbook_stdlib
    from analyst_spark.sources.excel import load_matrix_stdlib

    tpl = str(tmp_path / "tpl.xlsx")
    write_workbook_stdlib(tpl, {"S": {(1, 1): "title", (1, 2): "keep me"}})
    path = str(tmp_path / "merged.xlsx")
    FILE_MANAGER.register(path, template=tpl)
    FILE_MANAGER.write_cells(path, "S", {(2, 2): 7})
    FILE_MANAGER.save(path)
    FILE_MANAGER.discard(path)
    assert load_matrix_stdlib(path, "S") == [["title", None],
                                             ["keep me", 7]]
