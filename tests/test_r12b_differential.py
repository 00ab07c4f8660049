"""Randomized differentials for the round-12 session-2 entries: a
third, pure-Python implementation (hashlib md5) checked against the
Spark plans on random corpora — independent of both Spark and the
DuckDB oracles, the same triangulation test_r10_differential.py
applies to the incremental family.
"""

import hashlib
import os
import random

import pytest

from analyst_spark.plans import pipeline_plans as pp
from analyst_spark.plans import text_plans as tp
from tests.test_r10_differential import _rand_text, _sig_model, _bucket_model

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    td = str(tmp_path)
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t or "")) for i, t in rows], DOC_SCHEMA
    )
    docs.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
    return td


# --------------------------------------------- docs_global_shuffle


def _shuffle_model(doc_ids, seed, n_shards):
    rows = []
    by_shard = {}
    for d in doc_ids:
        k = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
        by_shard.setdefault(int(k[:8], 16) % n_shards, []).append((k, d))
    for s, lst in by_shard.items():
        for pos, (k, d) in enumerate(sorted(lst), start=1):
            rows.append((d, k, s, pos))
    return sorted(rows)


@pytest.mark.parametrize("seed", range(4))
def test_global_shuffle_random_vs_model(spark, tmp_path, seed):
    rng = random.Random(7700 + seed)
    ids = rng.sample(range(0, 10_000_000), 300)
    td = _write_docs(spark, tmp_path, [(i, f"doc {i}") for i in ids])
    got = sorted(
        tuple(r)
        for r in pp.docs_global_shuffle(spark, td)
        .select("doc_id", "shuffle_key", "shard_id", "pos")
        .collect()
    )
    from analyst_spark.functions.shuffle import shard_count_for

    # r13 auto-sizing: the entry derives n_shards from the corpus
    # count; the model must derive the same value
    assert got == _shuffle_model(
        ids, pp._SHUFFLE_SEED, shard_count_for(len(ids), pp._ROWS_PER_SHARD)
    )


# ------------------------------------------ contamination_minhash


def _xconta_model(rows, mod):
    """Cross-boundary LSH candidate pairs with band votes, from the
    pure-Python signature/bucket models."""
    sigs = {
        i: _sig_model(t) for i, t in rows
    }
    buckets = {
        i: set(_bucket_model(s)) for i, s in sigs.items() if s is not None
    }
    out = {}
    for i, bi in buckets.items():
        if i % mod == 0:
            continue
        for j, bj in buckets.items():
            if j % mod != 0:
                continue
            n = len(bi & bj)
            if n:
                out[(i, j)] = n
    return out


@pytest.mark.parametrize("seed", range(4))
def test_contamination_minhash_random_vs_model(spark, tmp_path, seed):
    rng = random.Random(9900 + seed)
    # benchmark members at multiples of 97; train docs elsewhere,
    # ~30% of them copies/near-copies of a benchmark text so the
    # cross join has real work to find
    bench = [(97 * j, _rand_text(rng)) for j in range(12)]
    train = []
    for j in range(40):
        i = 97 * (j + 1) + 1 + rng.randint(0, 94)
        r = rng.random()
        if r < 0.2 and bench:
            train.append((i, rng.choice(bench)[1]))
        elif r < 0.3 and bench:
            src = rng.choice(bench)[1]
            if src and len(src.split()) > 3:
                train.append((i, " ".join(src.split()[1:])))
            else:
                train.append((i, _rand_text(rng)))
        else:
            train.append((i, _rand_text(rng)))
    rows = [(i, t) for i, t in bench + train if t is not None]
    td = _write_docs(spark, tmp_path, rows)
    got = {
        (r["train_id"], r["bench_id"]): r["n_bands"]
        for r in tp.contamination_minhash(spark, td).collect()
    }
    assert got == _xconta_model(rows, tp._XCONTA_MOD)
