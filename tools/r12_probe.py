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


if __name__ == "__main__":
    {
        "wideband": main_wideband,
    }[sys.argv[1]]()
