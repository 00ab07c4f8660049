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

# Default per-shard row budget when n_shards is derived: sized so one
# shard's (key, payload) rows sort comfortably inside a single task's
# memory at production row widths (~100 B/row ⇒ ~400 MB). Gate
# entries override this downward so BOTH gate decades exercise real
# multi-shard auto-sizing (pipeline_plans._ROWS_PER_SHARD).
DEFAULT_ROWS_PER_SHARD = 4_000_000


def shard_count_for(n_rows: int, rows_per_shard: int) -> int:
    """ceil(n_rows / rows_per_shard), floor 1 — shared with the
    DuckDB oracle SQL (same integer arithmetic), so an auto-sized
    permutation is reproducible from the corpus count alone."""
    return max(1, (n_rows + rows_per_shard - 1) // rows_per_shard)


def seeded_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    n_shards: int | None = None,
    rows_per_shard: int = DEFAULT_ROWS_PER_SHARD,
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

    ``n_shards=None`` (the default since r13, VERDICT r12 #5) derives
    the shard count as ``ceil(count / rows_per_shard)`` — one cheap
    count pass (parquet metadata at scale) buys a per-shard sort
    bounded by ``rows_per_shard`` no matter how the corpus grows,
    instead of the fixed-16 shape whose per-shard sort share the
    ×1000 probe measured growing super-linearly. The derivation is
    plain integer arithmetic over the corpus count, so the DuckDB
    twin reproduces the IDENTICAL permutation from the same count
    (hash-gated at both decades). Pass an explicit ``n_shards`` to
    pin the layout (e.g. resuming an epoch whose shard files exist).
    """
    if n_shards is None:
        n_shards = shard_count_for(df.count(), rows_per_shard)
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
