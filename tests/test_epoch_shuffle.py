"""docs_epoch_shuffle pins (r14).

The entry is hash-gated vs DuckDB at both decades (the permutation
itself — md5 keys, shard prefixes, per-shard ranks — is identical on
both engines). What the gate cannot express: the CROSS-EPOCH
properties a training pipeline relies on, and the plan shape that
makes E epochs cost one shuffle.
"""

from pyspark.sql import functions as F

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.plans.pipeline_plans import _N_EPOCHS

SF = "/root/testdata/sf0.001"


def test_each_epoch_is_a_permutation_of_the_corpus(spark):
    rows = QUERIES["docs_epoch_shuffle"](spark, SF).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert sorted(by_epoch) == list(range(_N_EPOCHS))
    doc_ids = {r.doc_id for r in by_epoch[0]}
    for e, rs in by_epoch.items():
        assert {r.doc_id for r in rs} == doc_ids, f"epoch {e} lost docs"
        # pos is 1..shard_size contiguous within each shard
        shards = {}
        for r in rs:
            shards.setdefault(r.shard_id, []).append(r.pos)
        for sid, ps in shards.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), (e, sid)


def test_epoch_orders_are_decorrelated(spark):
    """Different epochs must yield genuinely different orders: the
    global reading order is (shard_id, pos); across any two epochs
    the fraction of docs keeping the same (shard_id, pos) slot must
    be tiny (md5 keys are independent across seed strings)."""
    rows = QUERIES["docs_epoch_shuffle"](spark, SF).collect()
    slot = {}
    for r in rows:
        slot.setdefault(r.epoch, {})[r.doc_id] = (r.shard_id, r.pos)
    n = len(slot[0])
    for a in range(_N_EPOCHS):
        for b in range(a + 1, _N_EPOCHS):
            same = sum(
                1 for d, s in slot[a].items() if slot[b].get(d) == s
            )
            assert same / n < 0.05, (a, b, same, n)


def test_epoch0_matches_global_shuffle_family_contract(spark):
    """Epoch layouts must be individually loader-compatible with
    docs_global_shuffle: same shard-count derivation, same key/rank
    rule — epoch 0 differs from docs_global_shuffle ONLY through its
    seed string ('epoch0-e0:' vs 'epoch0:'), so shard counts match."""
    eps = QUERIES["docs_epoch_shuffle"](spark, SF)
    glob = QUERIES["docs_global_shuffle"](spark, SF)
    e_shards = {r.shard_id for r in eps.filter(F.col("epoch") == 0).collect()}
    g_shards = {r.shard_id for r in glob.collect()}
    assert max(e_shards) == max(g_shards)


def test_single_manifest_exchange(spark):
    """E epochs cost ONE shuffle: explode is narrow, the window's
    (epoch, shard_id) hash partition is the only exchange; no join,
    no global sort, text pruned from the scan."""
    import contextlib
    import io

    df = QUERIES["docs_epoch_shuffle"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count(") Exchange") == 1, plan
    assert "Join" not in plan
    assert plan.count(") Window") == 1
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]
