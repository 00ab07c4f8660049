"""Bloom-pruned semi-join scale evidence (SCALE.md row source).

Replicates sf0.1 orders+lineitem x10 (orderkey offset per copy, so
the urgent key set and the fact table grow together — how a real
corpus scales) and times lineitem_bloom_semijoin against the plain
semi-join aggregation at sf0.1 and x10, min-of-2 after a codegen
warm pass. Also reports the pruning ledger at each scale: fact rows,
bloom candidates, true matches — the false-positive sliver is the
wasted shuffle the filter pays for its fixed size.

Usage: python tools/bloom_probe.py [--copies N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
BIG = "/tmp/asp_bloom_x10"
OFFSET = 100_000_000


def build_big(spark, copies: int) -> str:
    from pyspark.sql import functions as F

    marker = os.path.join(BIG, f"_DONE_{copies}")
    if os.path.exists(marker):
        return BIG
    import shutil

    shutil.rmtree(BIG, ignore_errors=True)  # stale copy count
    os.makedirs(BIG, exist_ok=True)
    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    o_parts, l_parts = [], []
    for i in range(copies):
        off = F.lit(i * OFFSET)
        o_parts.append(orders.withColumn("o_orderkey", F.col("o_orderkey") + off))
        l_parts.append(li.withColumn("l_orderkey", F.col("l_orderkey") + off))
    base = o_parts[0]
    for p in o_parts[1:]:
        base = base.unionByName(p)
    base.write.mode("overwrite").parquet(os.path.join(BIG, "orders.parquet"))
    base = l_parts[0]
    for p in l_parts[1:]:
        base = base.unionByName(p)
    base.write.mode("overwrite").parquet(os.path.join(BIG, "lineitem.parquet"))
    for f in os.listdir(SRC):
        dst = os.path.join(BIG, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)
    open(marker, "w").close()
    return BIG


def plain_semijoin(spark, sf_dir):
    """The unpruned strategy: exact semi-join, then the same agg."""
    from pyspark.sql import functions as F

    from analyst_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    li = t["lineitem"].select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    ).join(
        urgent.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


def ledger(spark, sf_dir, n_bits):
    from pyspark.sql import functions as F

    from analyst_spark.functions.bloom import bloom_build, bloom_prune
    from analyst_spark.tables import load_tables

    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    fact = t["lineitem"].select("l_orderkey")
    words = bloom_build(urgent.select("o_orderkey"), "o_orderkey", n_bits)
    local = spark.createDataFrame(words.collect(), "word_idx long, bits long")
    n_fact = fact.count()
    n_cand = bloom_prune(fact, "l_orderkey", local, n_bits).count()
    n_true = fact.join(
        urgent.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey", "left_semi",
    ).count()
    n_keys = urgent.count()
    return n_fact, n_cand, n_true, n_keys


def timed(fn, *args) -> float:
    samples = []
    for _ in range(2):
        t0 = time.time()
        fn(*args).write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
    return min(samples)


class no_broadcast:
    """Force the big-dim regime the filter exists for: with the dim
    side past every broadcast threshold, the exact semi-join is a
    SortMergeJoin and the fact shuffle is the dominant cost — the
    bloom stage's explicit F.broadcast hints (word table, bounded)
    are unaffected."""

    KEYS = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.saved = {}
        for k in self.KEYS:
            try:
                self.saved[k] = self.spark.conf.get(k)
            except Exception:
                self.saved[k] = None
            self.spark.conf.set(k, "-1")

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def main() -> None:
    copies = 10
    argv = sys.argv[1:]
    if "--copies" in argv:
        copies = int(argv[argv.index("--copies") + 1])
    spark = get_spark("bloom_probe")
    big = build_big(spark, copies)
    entry = QUERIES["lineitem_bloom_semijoin"]
    for sf in (SRC, big):
        # warm codegen
        entry(spark, sf).write.format("noop").mode("overwrite").save()
        plain_semijoin(spark, sf).write.format("noop").mode("overwrite").save()
        tb = timed(entry, spark, sf)
        tp = timed(plain_semijoin, spark, sf)
        with no_broadcast(spark):
            tb_nb = timed(entry, spark, sf)
            tp_nb = timed(plain_semijoin, spark, sf)
        print(
            f"{sf}: bloom={tb:.2f}s plain={tp:.2f}s | no-broadcast regime: "
            f"bloom={tb_nb:.2f}s plain={tp_nb:.2f}s",
            flush=True,
        )
        # pruning ledger at the entry's fixed size AND sized per the
        # ~16-bits/key spec (the saturation row is the point: a fixed
        # filter decays as keys grow; a sized one holds its FP rate)
        n_keys = None
        for n_bits in (1 << 19, 1 << 23) if sf == big else (1 << 19,):
            n_fact, n_cand, n_true, n_keys = ledger(spark, sf, n_bits)
            fp = n_cand - n_true
            print(
                f"  n_bits=2^{n_bits.bit_length() - 1} "
                f"({n_bits / max(1, n_keys):.1f} bits/key): keys={n_keys} "
                f"fact={n_fact} candidates={n_cand} true={n_true} "
                f"false_pos={fp} ({100.0 * fp / max(1, n_fact - n_true):.2f}% "
                f"of non-matches) shuffle_cut={100.0 * (1 - n_cand / n_fact):.1f}%",
                flush=True,
            )


if __name__ == "__main__":
    main()
