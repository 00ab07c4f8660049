"""LOOKUP join tests on the reference's fixture (FIXTURES.md F2 /
transforms/lookup_test.go): inner/outer, last-wins dup keys,
multi-key."""

from analyst_spark.operators.lookup import lookup_join


def _fixtures(spark):
    lookup = spark.createDataFrame(
        [(1, "Bob", 1), (2, "John", 2), (3, "Steve", 3)],
        ["id", "first_name", "ord"],
    )
    base = spark.createDataFrame(
        [(1, "Bobbertson"), (2, "Johnson"), (9, "Orphan")],
        ["lookup_id", "last_name"],
    )
    return base, lookup


def test_inner(spark):
    base, lookup = _fixtures(spark)
    out = lookup_join(
        base,
        lookup,
        on=[("lookup_id", "id")],
        select={"first_name": "first_name"},
        how="inner",
        order_col="ord",
    ).collect()
    got = {(r.lookup_id, r.last_name, r.first_name) for r in out}
    assert got == {(1, "Bobbertson", "Bob"), (2, "Johnson", "John")}


def test_outer_is_left(spark):
    # lookup.go:232-236 — OUTER keeps unmatched base rows with NULLs.
    base, lookup = _fixtures(spark)
    out = lookup_join(
        base,
        lookup,
        on=[("lookup_id", "id")],
        select={"first_name": "first_name"},
        how="outer",
        order_col="ord",
    ).collect()
    by_id = {r.lookup_id: r.first_name for r in out}
    assert len(out) == 3
    assert by_id[9] is None


def test_duplicate_keys_last_wins(spark):
    # lookup.go:185-188 — one row per key, last wins. Deterministic
    # analog: max order_col wins.
    lookup = spark.createDataFrame(
        [(1, "Old", 10), (1, "New", 20), (2, "Only", 5)],
        ["id", "name", "ord"],
    )
    base = spark.createDataFrame([(1,), (2,)], ["k"])
    out = lookup_join(
        base, lookup, on=[("k", "id")], select={"name": "name"},
        how="inner", order_col="ord",
    ).collect()
    got = {r.k: r.name for r in out}
    assert got == {1: "New", 2: "Only"}
    assert len(out) == 2  # dedup: no row multiplication


def test_multi_key(spark):
    lookup = spark.createDataFrame(
        [(1, "x", "A1x"), (1, "y", "A1y"), (2, "x", "A2x")],
        ["id", "tenant", "val"],
    )
    base = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "y")], ["k", "t"]
    )
    out = lookup_join(
        base, lookup, on=[("k", "id"), ("t", "tenant")],
        select={"val": "val"}, how="outer", order_col="val",
    ).collect()
    got = {(r.k, r.t): r.val for r in out}
    assert got == {(1, "x"): "A1x", (1, "y"): "A1y", (2, "y"): None}


def test_alias_projection(spark):
    base, lookup = _fixtures(spark)
    out = lookup_join(
        base, lookup, on=[("lookup_id", "id")],
        select={"first_name": "fn"}, how="inner", order_col="ord",
    )
    assert "fn" in out.columns and "first_name" not in out.columns


def test_duplicate_keys_no_order_col_single_whole_row(spark):
    # ADVICE r1: with order_col=None the lookup side must still
    # collapse to one row per key (lookup.go:185-188), and the
    # surviving columns must come from the SAME row.
    lookup = spark.createDataFrame(
        [(1, "A", 900), (1, "B", 100), (2, "C", 5)],
        ["id", "name", "score"],
    )
    base = spark.createDataFrame([(1,), (2,)], ["k"])
    out = lookup_join(
        base, lookup, on=[("k", "id")],
        select={"name": "name", "score": "score"},
        how="inner", order_col=None,
    ).collect()
    assert len(out) == 2  # no row multiplication
    got = {r.k: (r.name, r.score) for r in out}
    # greatest whole-row tuple wins: ("B", 100) beats ("A", 900) on name
    assert got[1] == ("B", 100)
    assert got[2] == ("C", 5)


def test_keys_only_select_no_order_col(spark):
    lookup = spark.createDataFrame([(1,), (1,), (2,)], ["id"])
    base = spark.createDataFrame([(1,), (3,)], ["k"])
    out = lookup_join(
        base, lookup, on=[("k", "id")], select={}, how="inner",
        order_col=None,
    ).collect()
    assert [r.k for r in out] == [1]
