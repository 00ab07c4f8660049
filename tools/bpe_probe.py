"""BPE trainer probe at >= 1k merges (VERDICT r5 #5).

The SCALE.md cost model says batched training costs O(merges/M) Spark
iterations, each a vocab-sized pair-count + bounded driver collect —
so wall time should be ~iterations x per-job overhead, independent of
corpus size once the word table is built. This probe measures it.

The driver's synthetic documents draw from a ~31-word vocabulary
(sf0.1), which physically supports only a few dozen merges — so the
probe trains on a generated wide-vocabulary word table (hex-derived
pseudo-words; every merge step has abundant candidates) and reports
wall time, measured iteration count vs the model's ceil(merges/M),
and merges/sec per batch size.

Usage: python tools/bpe_probe.py [num_merges] [batch ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.functions.bpe import bpe_train
from analyst_spark.session import get_spark


def synth_docs(spark, n_docs: int = 5000, words_per_doc: int = 20):
    """Documents of hex pseudo-words: ~n_docs*words_per_doc/3 distinct
    words of length 16 (md5 prefix), Zipf-free but pair-rich — every
    iteration has thousands of viable merge candidates."""
    return spark.range(n_docs).selectExpr(
        "id AS doc_id",
        f"""concat_ws(' ', transform(sequence(1, {words_per_doc}),
            j -> substr(md5(concat(cast(id % 33333 AS string), '_',
                                   cast((id + j) % 33333 AS string))), 1, 16)
        )) AS text""",
    )


def main() -> None:
    argv = sys.argv[1:]
    num_merges = int(argv[0]) if argv else 1000
    batches = [int(b) for b in argv[1:]] or [64, 256]
    spark = get_spark("bpe_probe")
    docs = synth_docs(spark).persist()
    docs.count()
    print(f"{'batch M':>8s} {'merges':>7s} {'iters':>6s} {'model':>6s} "
          f"{'wall':>8s} {'merges/s':>9s}")
    for m in batches:
        stats: dict = {}
        t0 = time.time()
        merges = bpe_train(
            docs, num_merges=num_merges, batch=m, stats=stats
        )
        wall = time.time() - t0
        import math

        model = math.ceil(num_merges / m)
        print(
            f"{m:8d} {len(merges):7d} {stats['iterations']:6d} {model:6d} "
            f"{wall:7.1f}s {len(merges) / wall:9.1f}",
            flush=True,
        )
    docs.unpersist()


if __name__ == "__main__":
    main()
