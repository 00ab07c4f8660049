"""Deterministic seeded global shuffle — reproducible training order
at corpus scale WITHOUT a total sort.

The problem: training wants each epoch's document order randomized,
reproducible (resumable jobs, auditable data order), and cheap at
100 TB. A global ``ORDER BY rand()`` is none of those — it needs a
total ordering (range-partitioned sort over the whole corpus) and a
new nondeterministic seed every run.

The device: shuffle_key = md5(seed ':' id) decorrelates the storage
order; shard = first 32 key bits mod n_shards is ONE hash-partitioned
exchange; pos = rank of the key within the shard is a per-shard
window sort over corpus/n_shards rows. Reading shards in shard_id
order and rows in pos order IS the seeded permutation, no total order
ever materialized. A new epoch is a new seed string; the same seed
reproduces the same order bit-for-bit on any engine that computes
md5 (the docs_global_shuffle catalog entry hash-gates this against a
DuckDB twin computing the identical permutation).

Sizing: n_shards bounds the per-task sort — pick it so corpus/n
fits one task's spill budget (e.g. 2k shards of 50 GB at 100 TB).

No analog in the reference (its engine has no notion of global
order randomization; closest is Sequencer-controlled source order,
engine/sequencer.go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seeded_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    n_shards: int = 16,
) -> DataFrame:
    """Append ``(shuffle_key, shard_id, pos)`` to ``df``: the
    deterministic seeded permutation, exposed as shard + rank so a
    training loader can consume it without any global sort. All of
    ``df``'s columns pass through (Catalyst prunes the ones a
    downstream projection drops), so payload — token counts, packed
    ids — rides the one exchange instead of re-joining afterwards.

    The plan is scan → project → ONE exchange (the window's
    partitionBy) → per-shard sort; adding a balancing repartition
    before it would move the corpus twice for nothing.
    """
    keyed = df.select(
        "*",
        F.md5(
            F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
        ).alias("shuffle_key"),
    )
    sharded = keyed.withColumn(
        "shard_id",
        (F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("long")
         % n_shards),
    )
    w = Window.partitionBy("shard_id").orderBy("shuffle_key", id_col)
    return sharded.withColumn(
        "pos", F.row_number().over(w).cast("long")
    )
