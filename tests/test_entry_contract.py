"""Driver-contract guard: __spark_entry__ must expose entry/queries/
oracle_sql with consistent keys, and the flagship must run at
sf0.001. Protects the external integration surface from refactors."""

import __spark_entry__ as entrymod


def test_contract_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    # every oracle belongs to a query; rows-only entries are the
    # explicit, documented exceptions
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "events_approx_distinct",  # HLL estimates are impl-specific
        "docs_stratified_sample",  # seeded sampler is engine-specific
        "agg_quantile_approx",     # sketch estimates are impl-specific
        "ann_ivf_trained",         # k-means centroids are engine-specific
        "bpe_train_merges",        # iterative; vs python model in test_bpe
        "bpe_train_batched",       # iterative; vs python model in test_bpe
        "docs_bpe_tokenize_pack",  # iterative merge table; stages parity-tested
    }
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_runs_at_smallest_sf(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_bench_headline_queries_are_registered():
    """bench.py's headline set must be a subset of the catalog —
    a renamed query key would otherwise break the driver's per-round
    BENCH run."""
    import bench

    qs = entrymod.queries()
    missing = [q for q in bench.BENCH_QUERIES if q not in qs]
    assert not missing, missing
    assert len(bench.BENCH_QUERIES) >= 20
