"""Round-11 scale probes (VERDICT r10 #1/#2/#7).

Subcommands:

  multiday [n_days] [hist_factor] [--chained]
      The incremental near-dup LIFECYCLE: a fixed-size batch ingested
      day after day through incremental_neardup_ingest (probe +
      index append + ledger). History starts at sf0.1 × hist_factor;
      each day's batch is the sf0.1 %4==0 slice re-id'd with a per-day
      offset and a dayN token prefix (so days near-match history and
      each other realistically). State (index + ledger) is WRITTEN TO
      PARQUET per day and re-read — the storage-backed daily-ingest
      shape, which truncates lineage. Reports per-day wall time — the
      claim is FLAT as the index grows by one batch per day.
      --chained keeps state as cached DataFrames instead (lineage
      accumulates across days): measured EXPONENTIAL planning growth
      4.0s → 421s by day 6 — the anti-pattern this probe documents.

  hamming [n_degenerate] [cap]
      VERDICT r10 #1: degenerate perceptual corpus — n identical
      signatures (solid-color-image shape: every band collides into
      ONE bucket) plus planted distinct near-twins. Times
      banded_hamming_pairs uncapped vs max_bucket_size=cap and
      reports recall on the planted twins + dropped-bucket
      accounting. Expectation: uncapped goes quadratic in the
      degenerate block; capped is bounded with recall 1.0 on the
      non-degenerate twins.

  perceptual [factors...]
      VERDICT r10 #7: multimodal_perceptual_dedup's signature+join
      stages at ×f documents decades — fake-image corpus grown by
      replication with per-copy pixel seeds (distinct signatures, so
      bucket occupancy stays realistic), planted dHash twins.

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
from analyst_spark.tables import load_tables

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def main_multiday() -> None:
    from analyst_spark.functions.dedup import (
        incremental_neardup_ingest,
        neardup_signature_index,
    )

    args = [a for a in sys.argv[2:] if a != "--chained"]
    chained = "--chained" in sys.argv
    n_days = int(args[0]) if args else 10
    hist_factor = int(args[1]) if len(args) > 1 else 1
    spark = get_spark("r11_multiday")
    state_dir = "/tmp/r11_multiday_state"
    docs = load_tables(spark, SRC)["documents"].select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 4 != 0)
    if hist_factor > 1:
        k = F.explode(F.sequence(F.lit(0), F.lit(hist_factor - 1))).alias("__k")
        hist = hist.select("*", k).select(
            (F.col("doc_id") + F.col("__k").cast("long") * OFFSET).alias(
                "doc_id"
            ),
            F.concat(
                F.lit("copy"), F.col("__k").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
        )
    base_batch = docs.filter(F.col("doc_id") % 4 == 0).persist()
    n_batch = base_batch.count()
    index = neardup_signature_index(hist).persist()
    n0 = index.count()
    print(f"fixed batch: {n_batch} docs/day; initial index: {n0} docs",
          flush=True)
    print(f"{'day':>4s} {'index rows':>11s} {'ledger rows':>12s} "
          f"{'day wall':>9s} {'pairs':>8s}", flush=True)
    reported = None
    n_led = 0
    for day in range(1, n_days + 1):
        day_batch = base_batch.select(
            (F.col("doc_id") + F.lit(day * 7 * OFFSET)).alias("doc_id"),
            F.concat(
                F.lit("day"), F.lit(str(day)), F.lit(" "), F.col("text")
            ).alias("text"),
        )
        t0 = time.time()
        pairs, new_index, new_reported = incremental_neardup_ingest(
            index, day_batch, reported
        )
        n_pairs = pairs.count()
        if chained:
            # the lineage-accumulation anti-pattern: planning cost
            # grows with the day count even though every parent is
            # cached (measured 4.0s -> 421s by day 6)
            new_index = new_index.persist()
            n_idx = new_index.count()
            new_reported = new_reported.persist()
            n_led = new_reported.count()
            release_cached(pairs)
            index.unpersist()
            if reported is not None:
                reported.unpersist()
            index, reported = new_index, new_reported
        else:
            # storage-backed state via the r12 API (VERDICT r11 #2):
            # save_state writes the day's index + ledger, load_state
            # reads them back — lineage truncated, the shape a real
            # daily pipeline has (state tables on disk)
            from analyst_spark.functions.incremental import (
                load_state,
                save_state,
            )

            save_state(new_index, new_reported, f"{state_dir}/d{day}")
            release_cached(pairs)
            index.unpersist()
            index, reported = load_state(spark, f"{state_dir}/d{day}")
            index = index.persist()
            n_idx = index.count()
            n_led = reported.count()
        dt = time.time() - t0
        print(f"{day:>4d} {n_idx:>11d} {n_led:>12d} {dt:>8.2f}s "
              f"{n_pairs:>8d}", flush=True)
    base_batch.unpersist()


def main_hamming() -> None:
    from analyst_spark.functions.multimodal import banded_hamming_pairs

    n_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("r11_hamming")
    # degenerate block: n identical signatures (solid-color corpus);
    # plants: 500 twin pairs with distinct per-pair band values
    deg = spark.range(n_deg).select(
        F.col("id").alias("doc_id"),
        F.lit(7).alias("b0"), F.lit(7).alias("b1"),
        F.lit(7).alias("b2"), F.lit(7).alias("b3"),
    )
    base = 10 * OFFSET
    tw = spark.range(500).select(
        F.explode(
            F.array(
                F.struct(
                    (F.lit(base) + F.col("id") * 2).alias("doc_id"),
                    (F.col("id") % 30000 + 100).cast("int").alias("b0"),
                    (F.col("id") / F.lit(30000) + 200).cast("int").alias("b1"),
                    F.lit(300).alias("b2"), F.lit(400).alias("b3"),
                ),
                F.struct(
                    (F.lit(base) + F.col("id") * 2 + 1).alias("doc_id"),
                    (F.col("id") % 30000 + 100).cast("int").alias("b0"),
                    (F.col("id") / F.lit(30000) + 200).cast("int").alias("b1"),
                    F.lit(300).alias("b2"), F.lit(401).alias("b3"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    sigs = deg.unionByName(tw)
    for label, kwargs in [
        ("uncapped", {}),
        (f"cap={cap}", {"max_bucket_size": cap}),
    ]:
        best = pairs = None
        for _ in range(2):
            t0 = time.time()
            out = banded_hamming_pairs(sigs, max_distance=3, **kwargs)
            pairs = out.count()
            dt = time.time() - t0
            dropped = getattr(out, "_asp_dropped_buckets", None)
            acct = (
                [(r.band, r.bsz, r.dropped_pairs) for r in dropped.collect()]
                if dropped is not None
                else None
            )
            release_cached(out)
            best = dt if best is None else min(best, dt)
        # twin recall: every planted pair must survive the cap (their
        # buckets are small); the degenerate block's pairs are the
        # dropped work
        extra = f"  dropped={acct}" if acct else ""
        print(f"{label:>10}: {best:7.2f}s  pairs={pairs}{extra}", flush=True)


def _diverse_sigs(spark, n_docs: int):
    """(doc_id, b0..b3) signature corpus with DIVERSE band values —
    md5-derived 16-bit ints per doc. The fake-image generator cannot
    produce this (pixels are an arithmetic progression mod 251, so
    any fake corpus has ≤251 distinct signatures — a dup storm by
    construction, already covered by the `hamming` subcommand); the
    shared engine's realistic scaling input is a diverse signature
    frame, which is exactly the frame image_dhash_bands /
    audio_fingerprint_bands hand it. Every 7th doc gets a planted
    twin (last band XOR 1 ⇒ true Hamming distance exactly 1; an
    earlier +1 variant measured "recall 0.87" — correctly: popcount
    of xor(v, v+1) exceeds 3 for 12.5% of values, and the engine
    rightly filtered those, so the plant, not the engine, was
    wrong)."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(f"|{k}"))),
                    1,
                    4,
                ),
                16,
                10,
            )
            .cast("int")
            .alias(f"b{k}")
            for k in range(4)
        ],
    )
    twins = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100 * OFFSET).alias("doc_id"),
        "b0",
        "b1",
        "b2",
        F.expr("CAST(b3 ^ 1 AS INT)").alias("b3"),
    )
    return base.unionByName(twins)


def main_perceptual() -> None:
    from analyst_spark.functions.multimodal import banded_hamming_pairs

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    base_n = 12500  # ≈ the sf0.1 documents count the gated entry signs
    spark = get_spark("r11_perceptual")
    cap = None
    for f_ in factors:
        sigs = _diverse_sigs(spark, base_n * f_).persist()
        n = sigs.count()
        n_twins = n - base_n * f_
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
            f"x{f_:>4d}: {n:>9d} sigs  {best:7.2f}s  pairs={pairs}"
            f"  twin_recall={recall:.4f}",
            flush=True,
        )


def main_sigpass() -> None:
    """Arrow-batched signature passes (image dHash + audio energy
    fingerprint) over generated corpora at ×f — the linear half of
    the perceptual entries' decade claim (the join half is the
    `perceptual` subcommand; grown FAKE-image corpora are mod-251
    dup storms, so the join must be probed on diverse signatures,
    not on the generator)."""
    from analyst_spark.functions.multimodal import (
        audio_fingerprint_bands,
        image_dhash_bands,
    )

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    base_n = 12500
    spark = get_spark("r11_sigpass")

    def gen_imgs(batches):
        import pandas as pd

        from analyst_spark.functions.multimodal import encode_fake_image

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "image": [
                        bytearray(encode_fake_image(int(d), 8, 8))
                        for d in pdf["id"]
                    ],
                }
            )

    def gen_auds(batches):
        import pandas as pd

        from analyst_spark.functions.multimodal import encode_fake_audio

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "audio": [
                        bytearray(encode_fake_audio(int(d)))
                        for d in pdf["id"]
                    ],
                }
            )

    for f_ in factors:
        n = base_n * f_
        ids = spark.range(n).repartition(64)
        for label, gen, schema, sig in (
            ("image", gen_imgs, "doc_id long, image binary",
             image_dhash_bands),
            ("audio", gen_auds, "doc_id long, audio binary",
             audio_fingerprint_bands),
        ):
            corpus = ids.mapInPandas(gen, schema)
            best = None
            for _ in range(2):
                t0 = time.time()
                cnt = sig(corpus).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"x{f_:>4d} {label}: {cnt:>9d} sigs  {best:7.2f}s",
                  flush=True)


def main_gapfillrouted() -> None:
    """The span router END-TO-END on time-grown corpora (reuses the
    r10 time-growth builder via import): at ×1 (30 days) the router
    must pick global; at ×10/×100 (300/3000 days — past the 2,880 h
    threshold at ×10) it must pick chunked, and the routed wall must
    track the chunked form, not the 476×-decayed global."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "r10_probe",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "r10_probe.py"),
    )
    r10 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(r10)

    from analyst_spark.plans.events_plans import (
        GAPFILL_ROUTE_SPAN_HOURS,
        _gapfill_routed,
    )

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark("r11_gapfillrouted")
    for f_ in factors:
        d = SRC if f_ == 1 else r10._time_grown_events(spark, f_)
        best = routing = None
        for _ in range(2):
            t0 = time.time()
            out = _gapfill_routed(spark, d, GAPFILL_ROUTE_SPAN_HOURS)
            routing = out._asp_routing
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"x{f_:>4d}: {best:7.2f}s  routing={routing}", flush=True)


def main_embinc() -> None:
    """Incremental embedding probe at growing HISTORY: fixed batch
    (the %4==0 vectors + colinear plants), history ×f with per-copy
    deterministic coordinate jitter (distinct vectors, realistic
    bucket occupancy — exact replication would be a colinear dup
    storm). Claim: probe cost flat-ish as history grows — the batch
    side signs a constant set and candidates are bucket-bounded."""
    from analyst_spark.functions.similarity import (
        incremental_embedding_pairs,
    )

    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 100]
    spark = get_spark("r11_embinc")
    emb = load_tables(spark, SRC)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    is_new = F.col("vec_id") % 4 == 0
    batch = emb.filter(is_new).persist()
    n_batch = batch.count()
    print(f"fixed batch: {n_batch} vectors", flush=True)
    hist1 = emb.filter(~is_new)
    # plant colinear twins of every 10th batch vector INTO history so
    # the verify path runs and recall is checkable (expected pairs =
    # plants at every factor)
    plants = batch.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 55 * OFFSET).alias("vec_id"),
        F.expr("transform(embedding, x -> x * 3.0)").alias("embedding"),
    )
    n_plants = plants.count()
    print(f"planted twins in history: {n_plants}", flush=True)
    hist1 = hist1.unionByName(plants)
    for f_ in factors:
        if f_ == 1:
            hist = hist1
        else:
            k = F.explode(F.sequence(F.lit(0), F.lit(f_ - 1))).alias("__k")
            # per-copy jitter: coordinate i gets +k*(i+1)*1e-3 —
            # deterministic, distinct directions per copy
            hist = hist1.select("*", k).select(
                (F.col("vec_id") + F.col("__k").cast("long") * OFFSET).alias(
                    "vec_id"
                ),
                F.expr(
                    "transform(embedding, (x, i) -> "
                    "x + __k * (i + 1) * 0.001)"
                ).alias("embedding"),
            )
        hist = hist.persist()
        n_hist = hist.count()
        best = pairs = None
        for _ in range(2):
            t0 = time.time()
            out = incremental_embedding_pairs(hist, batch, 0.9, dim=64)
            pairs = out.count()
            dt = time.time() - t0
            release_cached(out)
            best = dt if best is None else min(best, dt)
        hist.unpersist()
        print(f"x{f_:>4d}: {n_hist:>9d} hist  {best:7.2f}s  pairs={pairs}",
              flush=True)


if __name__ == "__main__":
    {
        "multiday": main_multiday,
        "hamming": main_hamming,
        "perceptual": main_perceptual,
        "sigpass": main_sigpass,
        "gapfillrouted": main_gapfillrouted,
        "embinc": main_embinc,
    }[sys.argv[1]]()
