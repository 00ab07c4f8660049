"""Round-12 scale probes.

Subcommands:

  wideband [n_millions...] (default 2 10)
      VERDICT r11 #1: the wide-band Hamming engine at ≥10M DIVERSE
      signatures. Generates md5-derived diverse band values at BOTH
      widths (16-bit and 32-bit bands; same engine, width set at
      signature time) with a planted twin every 7th doc (last band
      XOR 1 ⇒ true Hamming distance exactly 1). Expected random-
      collision candidates = 4·C(n,2)/2^band_bits:
        16-bit @ 1.43M  ≈ 62M   (measured 8.2s, r11 — reproduced here
                                 at small n for continuity)
        16-bit @ 10M    ≈ 3.1e9 (NOT run uncapped — the point)
        32-bit @ 10M    ≈ 47k   (bounded; this probe's claim)
      Reports wall, pair count, planted-twin recall (must be 1.0).
      The 16-bit width only runs at n <= 2M; above that it prints the
      projected candidate count instead of melting the host.

Long runs: SPARK_GRAFT_LOCAL_DIR=/tmp/spark-local (hourly /dev/shm
wipe at :00).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyst_spark.functions.dedup import release_cached
from analyst_spark.session import get_spark

OFFSET = 10_000_000


def _diverse_sigs(spark, n_docs: int, band_bits: int):
    """(doc_id, b0..b3) with DIVERSE md5-derived band values of the
    requested width (hex chars: 4 → 16-bit, 8 → 32-bit), planted
    twin every 7th doc with the last band XOR 1 (distance exactly 1;
    +1 would flip multiple bits on carry — the r11 probe's lesson)."""
    hexlen = band_bits // 4
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|{k}"))),
                    1,
                    hexlen,
                ),
                16,
                10,
            )
            .cast("long")
            .alias(f"b{k}")
            for k in range(4)
        ],
    )
    twins = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100 * OFFSET).alias("doc_id"),
        "b0",
        "b1",
        "b2",
        F.expr("CAST(b3 ^ 1 AS BIGINT)").alias("b3"),
    )
    return base.unionByName(twins)


def main_wideband() -> None:
    from analyst_spark.functions.multimodal import banded_hamming_pairs

    millions = [float(a) for a in sys.argv[2:]] or [2.0, 10.0]
    spark = get_spark("r12_wideband")
    for m in millions:
        n = int(m * 1_000_000)
        for bits in (16, 32):
            exp = 4 * n * (n - 1) / 2 / (1 << bits)
            if bits == 16 and n > 2_000_000:
                print(
                    f"n={n:>9d} bits=16: SKIPPED (expected "
                    f"~{exp:.2e} collision candidates — the blowup "
                    "this probe exists to document)",
                    flush=True,
                )
                continue
            sigs = _diverse_sigs(spark, n, bits).persist()
            total = sigs.count()
            n_twins = total - n
            best = pairs = recall = None
            for _ in range(2):
                t0 = time.time()
                out = banded_hamming_pairs(sigs, max_distance=3)
                pairs = out.count()
                dt = time.time() - t0
                recovered = out.filter(
                    F.col("id_b") - F.col("id_a") == 100 * OFFSET
                ).count()
                recall = recovered / n_twins
                release_cached(out)
                best = dt if best is None else min(best, dt)
            sigs.unpersist()
            print(
                f"n={n:>9d} bits={bits}: {best:8.2f}s  pairs={pairs}"
                f"  twin_recall={recall:.4f}  expected_collisions≈{exp:.2e}",
                flush=True,
            )


def main_hamming_days() -> None:
    """10-day incremental PERCEPTUAL lifecycle through the storage
    API (VERDICT r11 #3 follow-through at probe scale): history
    starts at 1M diverse signatures; each day ingests a fixed 100k
    batch (diverse sigs + 1k twins of history rows — last band XOR
    1) via incremental_hamming_ingest, state written/re-read with
    save_state/load_state per day. Claim: per-day wall FLAT as the
    index grows by 100k/day; twin pairs recovered every day."""
    import shutil

    from analyst_spark.functions.incremental import load_state, save_state
    from analyst_spark.functions.multimodal import incremental_hamming_ingest

    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("r12_hamming_days")
    state_dir = "/tmp/r12_hamming_state"
    shutil.rmtree(state_dir, ignore_errors=True)
    hist = _diverse_sigs(spark, 1_000_000, 32).filter(
        F.col("doc_id") < 1_000_000
    )  # drop the generator's built-in twins; days plant their own
    index = hist.persist()
    n0 = index.count()
    reported = None
    print(f"initial index: {n0} sigs; 100k/day + 1k planted twins",
          flush=True)
    print(f"{'day':>4s} {'index rows':>11s} {'ledger rows':>12s} "
          f"{'day wall':>9s} {'pairs':>7s} {'twins':>6s}", flush=True)
    for day in range(1, n_days + 1):
        base = day * 10_000_000
        fresh = _diverse_sigs(spark, 100_000, 32).filter(
            F.col("doc_id") < 100_000
        ).select(
            (F.col("doc_id") + base).alias("doc_id"),
            # re-derive bands from the offset id so each day's corpus
            # is distinct
            *[
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                (F.col("doc_id") + base).cast("string"),
                                F.lit(f"|d{k}"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias(f"b{k}")
                for k in range(4)
            ],
        )
        twins = index.filter(
            (F.col("doc_id") % 997 == day) & (F.col("doc_id") < 1_000_000)
        ).orderBy("doc_id").limit(1000).select(
            (F.col("doc_id") + base + 5_000_000).alias("doc_id"),
            "b0",
            "b1",
            "b2",
            F.expr("CAST(b3 ^ 1 AS BIGINT)").alias("b3"),
        )
        batch = fresh.unionByName(twins)
        t0 = time.time()
        pairs, new_index, new_reported = incremental_hamming_ingest(
            index, batch, reported
        )
        n_pairs = pairs.count()
        n_twins = pairs.filter(F.col("id_batch") >= base + 5_000_000).count()
        save_state(new_index, new_reported, f"{state_dir}/d{day}")
        release_cached(pairs)
        index.unpersist()
        index, reported = load_state(spark, f"{state_dir}/d{day}")
        index = index.persist()
        n_idx = index.count()
        n_led = reported.count()
        dt = time.time() - t0
        print(f"{day:>4d} {n_idx:>11d} {n_led:>12d} {dt:>8.2f}s "
              f"{n_pairs:>7d} {n_twins:>6d}", flush=True)


def main_embedding_days() -> None:
    """10-day incremental EMBEDDING lifecycle through the storage
    API: history = the sf0.1 non-batch vectors (jittered ×hist_f);
    each day ingests the fixed %4==0 slice re-id'd per day plus 50
    colinear twins of history vectors. Per-day wall must stay flat;
    the 50 plants must surface every day."""
    import shutil

    from analyst_spark.functions.incremental import load_state, save_state
    from analyst_spark.functions.similarity import (
        embedding_index,
        incremental_embedding_ingest,
    )
    from analyst_spark.tables import load_tables

    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("r12_embedding_days")
    state_dir = "/tmp/r12_embedding_state"
    shutil.rmtree(state_dir, ignore_errors=True)
    emb = load_tables(spark, "/root/testdata/sf0.1")["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    is_new = F.col("vec_id") % 4 == 0
    hist = emb.filter(~is_new)
    base_batch = emb.filter(is_new).persist()
    n_batch = base_batch.count()
    index = embedding_index(hist).persist()
    n0 = index.count()
    plants_src = (
        hist.filter(F.col("vec_id") % 40 == 1).orderBy("vec_id").limit(50)
    ).persist()
    reported = None
    print(f"initial index: {n0} vectors; {n_batch}/day + 50 plants",
          flush=True)
    print(f"{'day':>4s} {'index rows':>11s} {'ledger rows':>12s} "
          f"{'day wall':>9s} {'pairs':>7s} {'twins':>6s}", flush=True)
    for day in range(1, n_days + 1):
        base = day * 10_000_000
        day_batch = base_batch.select(
            (F.col("vec_id") + base).alias("vec_id"),
            F.expr(
                f"transform(embedding, (x, i) -> x + {day} * (i + 1) * 1e-4)"
            ).alias("embedding"),
        ).unionByName(
            plants_src.select(
                (F.col("vec_id") + base + 5_000_000).alias("vec_id"),
                F.expr("transform(embedding, x -> x * 2.0)").alias(
                    "embedding"
                ),
            )
        )
        t0 = time.time()
        pairs, new_index, new_reported = incremental_embedding_ingest(
            index, day_batch, 0.9, reported, dim=64
        )
        n_pairs = pairs.count()
        n_twins = pairs.filter(
            F.col("id_batch") >= base + 5_000_000
        ).count()
        save_state(new_index, new_reported, f"{state_dir}/d{day}")
        release_cached(pairs)
        index.unpersist()
        index, reported = load_state(spark, f"{state_dir}/d{day}")
        index = index.persist()
        n_idx = index.count()
        n_led = reported.count()
        dt = time.time() - t0
        print(f"{day:>4d} {n_idx:>11d} {n_led:>12d} {dt:>8.2f}s "
              f"{n_pairs:>7d} {n_twins:>6d}", flush=True)
    base_batch.unpersist()


if __name__ == "__main__":
    {
        "wideband": main_wideband,
        "hamming_days": main_hamming_days,
        "embedding_days": main_embedding_days,
    }[sys.argv[1]]()
