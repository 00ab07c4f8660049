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
        "agg_quantile_sketch",     # sketch estimates are impl-specific
        "lineitem_profile_approx",  # HLL profile; banded gate in verify_local
        "events_distinct_users_hll",  # HLL sketch; banded gate in verify_local
        "streaming_distinct_users_hll",  # streaming HLL; banded gate + batch pin
        "text_heavy_hitters_cms",  # CMS estimates; banded gate + JVM parity pin
        "streaming_heavy_hitters_cms",  # streaming CMS; banded gate + blob pin
        "ann_ivf_trained",         # k-means centroids are engine-specific
        "dedup_semantic_trained",  # k-means clustering; twin-pinned in test_similarity
        "embeddings_pca",          # eigendecomposition; twin-pinned in test_pca
        "docs_quality_classifier", # iterative IRLS; accuracy-gated in verify_local + numpy twin
        "ann_pca_ivf",             # PCA chain; recall-pinned in test_pca
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


def test_verify_local_artifact_covers_full_catalog():
    """VERDICT r5 #8: the committed VERIFY_LOCAL_r{N}.json must cover
    EXACTLY the catalog's query set — a newly registered entry that
    hasn't been re-verified (or a stale artifact after a rename)
    fails here instead of silently riding an old 105/105."""
    import json
    import os
    import re

    from analyst_spark.plans.catalog import QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts = sorted(
        (int(m.group(1)), fn)
        for fn in os.listdir(root)
        if (m := re.fullmatch(r"VERIFY_LOCAL_r(\d+)\.json", fn))
    )
    assert artifacts, "no VERIFY_LOCAL artifact committed"
    latest = os.path.join(root, artifacts[-1][1])
    with open(latest) as f:
        data = json.load(f)
    got = set(data["queries"])
    want = set(QUERIES)
    assert got == want, (
        f"{os.path.basename(latest)} out of date: "
        f"missing={sorted(want - got)} stale={sorted(got - want)} "
        f"— re-run `python tools/verify_local.py --json {os.path.basename(latest)}`"
    )
    assert data["green"] == data["n"] == len(want), data.get("failures")


def test_banded_gates_cover_trained_ann_family():
    """VERDICT r10 #4: the iterative/trained entries must carry
    measured-quality banded gates in verify_local — rows-only is not
    enough for them anymore."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_local",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "verify_local.py"),
    )
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)
    for name in (
        "ann_pca_ivf",
        "ann_ivf_trained",
        "dedup_semantic_trained",
        "embeddings_pca",
        "agg_quantile_sketch",
        "events_approx_distinct",
        "docs_stratified_sample",
        "docs_bpe_tokenize_pack",
        "docs_quality_classifier",
        "bpe_train_merges",
        "bpe_train_batched",
    ):
        assert name in vl.BANDED_CHECKS, name


def test_first_50_registrations_all_hash_gated():
    """The driver gates the first 50 registered entries; every one
    must carry a DuckDB oracle (VERDICT r10 #8 — also asserted at
    catalog import, this mirrors it where a red test is visible)."""
    from analyst_spark.plans.catalog import ORACLES, QUERIES

    first50 = list(QUERIES)[:50]
    assert all(k in ORACLES for k in first50)
