"""Dup-storm safety probe for the standalone ``dedup_lsh_verified``
operator (VERDICT r6 #3b).

Builds a pathological 90 %-byte-clone corpus — every sf0.1 document
replicated CLONES× with IDENTICAL text and distinct ids — and times
``lsh_verified_pairs`` with the r7 ``collapse_exact`` pre-step on and
off. Off reproduces the r6 failure mode (candidate volume =
Σ per-group C(CLONES,2) pairs each paying shingle-set propagation in
the verify join); on pays one fingerprint shuffle + LSH over UNIQUE
texts + output-proportional pair expansion.

The two modes are first checked for pair-set equality at sf0.01 scale
(beyond the pytest twin), then timed at sf0.1×CLONES.

Usage: python tools/dup_storm_probe.py [clones]
       python tools/dup_storm_probe.py near [clones] [cap]

``near`` mode (r8, VERDICT r7 #4) builds the storm the exact-collapse
CANNOT absorb — every copy's text differs by one appended token, so
the answer itself is quadratic in the clone-group size — and measures
the opt-in ``max_bucket_size`` cap: wall time, surviving pair count,
dropped-candidate accounting, and recall vs the uncapped run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analyst_spark.functions.dedup import lsh_verified_pairs, release_cached
from analyst_spark.session import get_spark
from analyst_spark.tables import load_tables

OFFSET = 10_000_000


def clone_corpus(docs, copies: int):
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"), "text"
        )
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(docs, collapse: bool) -> tuple[float, int]:
    t0 = time.time()
    out = lsh_verified_pairs(docs, collapse_exact=collapse)
    n = out.count()
    dt = time.time() - t0
    release_cached(out)
    return dt, n


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("dup_storm_probe")

    # equality check at small scale (both modes enumerate fully)
    small = clone_corpus(
        load_tables(spark, "/root/testdata/sf0.01")["documents"], 3
    )
    for mode in (True, False):
        out = lsh_verified_pairs(small, collapse_exact=mode)
        rows = {(r.id_a, r.id_b, r.jaccard) for r in out.collect()}
        release_cached(out)
        if mode:
            ref = rows
    assert rows == ref, "collapse changed the pair set"
    print(f"equality check: {len(ref)} pairs identical in both modes")

    big = clone_corpus(
        load_tables(spark, "/root/testdata/sf0.1")["documents"], copies
    ).persist()
    big.count()
    # warmup codegen on a tiny slice
    w = big.limit(50)
    for mode in (True, False):
        release_cached_out = lsh_verified_pairs(w, collapse_exact=mode)
        release_cached_out.count()
        release_cached(release_cached_out)

    for mode in (True, False):
        best = None
        for _ in range(2):
            dt, n = timed(big, mode)
            best = dt if best is None else min(best, dt)
        label = "collapse_exact=ON " if mode else "collapse_exact=OFF"
        print(f"{label}: {best:7.2f}s  pairs={n}", flush=True)


def near_clone_corpus(docs, copies: int):
    """Each copy appends a distinct token: byte-distinct, Jaccard
    ~1 - 1/|shingles| — the collapse pre-step sees 0% duplication."""
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit(f"variant{k}")).alias("text"),
        )
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main_near() -> None:
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    spark = get_spark("dup_storm_probe_near")
    big = near_clone_corpus(
        load_tables(spark, "/root/testdata/sf0.1")["documents"], copies
    ).persist()
    n_docs = big.count()
    print(f"near-clone corpus: {n_docs} docs ({copies} copies)", flush=True)

    results = {}
    for label, kw in (
        ("uncapped", {}),
        (f"cap={cap}", {"max_bucket_size": cap}),
    ):
        best, pairs, dropped = None, None, 0
        for _ in range(2):
            t0 = time.time()
            out = lsh_verified_pairs(big, collapse_exact=False, **kw)
            pairs = out.count()
            dt = time.time() - t0
            acct = getattr(out, "_asp_dropped_buckets", None)
            if acct is not None:
                row = acct.agg(
                    F.coalesce(F.sum("dropped_pairs"), F.lit(0)).alias("d"),
                    F.count(F.lit(1)).alias("b"),
                ).first()
                dropped = (row["d"], row["b"])
            release_cached(out)
            best = dt if best is None else min(best, dt)
        results[label] = (best, pairs)
        extra = f"  dropped_candidates={dropped[0]} over {dropped[1]} buckets" if dropped else ""
        print(f"{label:>10}: {best:7.2f}s  pairs={pairs}{extra}", flush=True)
    (t_u, p_u), (t_c, p_c) = results.values()
    print(
        f"recall={p_c / p_u:.4f}  speedup={t_u / t_c:.2f}x", flush=True
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "near":
        main_near()
    else:
        main()
