"""Hot-key-safe sessionization (VERDICT r7 #3).

Per-user gap sessionization is a WINDOW computation: one user's whole
history must sort inside a single task, so a pathological key (a bot
with a billion events) straggles the stage no matter how the rest of
the corpus is partitioned — the r7 SCALE.md probe measured the plain
window degrading linearly with the hot key's own volume (1M-event
user -> 2.2s in-task sort at sf0.1).

``sessionize_chunked`` bounds per-task state by time-slicing:

1. bucket events into fixed time slices (``slice_s``; default 1 day)
   and sessionize WITHIN each (user, slice) — the window partition is
   now (user, slice), so per-task sort state is bounded by one key's
   volume in one slice, not its lifetime volume;
2. reduce each (user, slice) to a constant-size summary (local
   session count, first/last session length + timestamps, max
   middle-session length);
3. merge sessions that span slice boundaries with a second window
   over the per-slice summaries — at most ``range/slice_s`` rows per
   user, independent of event volume.

The merge is exact, not approximate: two sessions merge across a
boundary iff the gap between the last event of slice i and the first
event of slice i+1 is <= ``gap_s`` — precisely the complement of the
split rule inside a slice — so the result equals the plain
single-window sessionization row-for-row (the catalog entry is gated
against the SAME DuckDB oracle as events_user_sessions).

``hot_threshold`` routes: users with more events than the threshold
take the chunked path, everyone else the plain single-window path
(cheaper: no second shuffle). The hot set is an aggregate-derived
handful of keys — broadcast by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _plain_sessions(
    ev: DataFrame, user_col: str, ts_col: str, order_col: str, gap_s: int
) -> DataFrame:
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sess = ev.withColumn("_ns", new_sess).withColumn(
        "_sid", F.sum("_ns").over(w)
    )
    per_session = sess.groupBy(user_col, "_sid").agg(
        F.count(F.lit(1)).alias("_len")
    )
    return per_session.groupBy(user_col).agg(
        F.max("_sid").cast("long").alias("n_sessions"),
        F.max("_len").cast("long").alias("max_session_events"),
    )


def _chunked_sessions(
    ev: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    gap_s: int,
    slice_s: int,
) -> DataFrame:
    sec = F.unix_timestamp(ts_col)
    df = ev.select(
        user_col,
        F.col(ts_col),
        F.col(order_col),
        sec.alias("_sec"),
        F.floor(sec / slice_s).alias("_slice"),
    )
    # 1. local sessionization — window state bounded by one slice
    wloc = Window.partitionBy(user_col, "_slice").orderBy(ts_col, order_col)
    gap = F.col("_sec") - F.lag("_sec").over(wloc)
    new_sess = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    loc = df.withColumn("_ns", new_sess).withColumn(
        "_sid", F.sum("_ns").over(wloc)
    )
    sess = loc.groupBy(user_col, "_slice", "_sid").agg(
        F.count(F.lit(1)).alias("_len"),
        F.min("_sec").alias("_start"),
        F.max("_sec").alias("_end"),
    )
    # 2. constant-size per-slice summary
    wss = Window.partitionBy(user_col, "_slice")
    sess = sess.withColumn("_nloc", F.max("_sid").over(wss))
    slz = sess.groupBy(user_col, "_slice").agg(
        F.max("_nloc").alias("_nloc"),
        F.min("_start").alias("_first_ts"),
        F.max("_end").alias("_last_ts"),
        F.max(F.when(F.col("_sid") == 1, F.col("_len"))).alias("_first_len"),
        F.max(F.when(F.col("_sid") == F.col("_nloc"), F.col("_len"))).alias(
            "_last_len"
        ),
        F.max(
            F.when(
                (F.col("_sid") > 1) & (F.col("_sid") < F.col("_nloc")),
                F.col("_len"),
            )
        ).alias("_mid_max"),
    )
    # 3. boundary merge — a session continues across the slice edge
    # iff the inter-slice gap is <= gap_s (the exact complement of
    # the split rule), evaluated per user over the slice summaries
    wu = Window.partitionBy(user_col).orderBy("_slice")
    prev_last = F.lag("_last_ts").over(wu)
    merge = F.when(prev_last.isNull(), F.lit(False)).otherwise(
        (F.col("_first_ts") - prev_last) <= F.lit(gap_s)
    )
    endpoint = lambda pos, length, bond: F.struct(  # noqa: E731
        F.lit(pos).alias("pos"), length.alias("len"), bond.alias("bond")
    )
    rows = slz.withColumn("_merge", merge).select(
        user_col,
        "_slice",
        "_nloc",
        "_mid_max",
        F.explode(
            F.when(
                F.col("_nloc") == 1,
                F.array(
                    endpoint(0, F.col("_first_len"), F.col("_merge"))
                ),
            ).otherwise(
                F.array(
                    endpoint(0, F.col("_first_len"), F.col("_merge")),
                    endpoint(1, F.col("_last_len"), F.lit(False)),
                )
            )
        ).alias("e"),
    )
    # chains of bonded endpoints = merged sessions (path-graph
    # connected components via a cumulative run id)
    wr = Window.partitionBy(user_col).orderBy("_slice", "e.pos")
    run = F.sum(F.when(F.col("e.bond"), 0).otherwise(1)).over(wr)
    merged = (
        rows.withColumn("_run", run)
        .groupBy(user_col, "_run")
        .agg(F.sum("e.len").alias("_mlen"))
    )
    per_user_runs = merged.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("_n_runs"),
        F.max("_mlen").alias("_run_max"),
    )
    per_user_mid = slz.groupBy(user_col).agg(
        F.max("_mid_max").alias("_mid"),
        F.sum(F.greatest(F.col("_nloc") - 2, F.lit(0))).alias("_n_mids"),
    )
    return per_user_runs.join(per_user_mid, user_col).select(
        user_col,
        (F.col("_n_runs") + F.col("_n_mids")).cast("long").alias("n_sessions"),
        F.greatest(F.col("_run_max"), F.coalesce(F.col("_mid"), F.lit(0)))
        .cast("long")
        .alias("max_session_events"),
    )


def sessionize_chunked(
    ev: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 1800,
    slice_s: int = 86400,
    hot_threshold: int | None = None,
) -> DataFrame:
    """Per-user (n_sessions, max_session_events) with bounded per-task
    window state. ``hot_threshold=None`` chunks every user (the fully
    deterministic plan the catalog entry gates); an integer routes
    only users with more events than the threshold through the
    chunked path and the rest through the plain single-window path.
    """
    if hot_threshold is None:
        return _chunked_sessions(
            ev, user_col, ts_col, order_col, gap_s, slice_s
        )
    counts = ev.groupBy(user_col).agg(F.count(F.lit(1)).alias("_n"))
    hot = counts.filter(F.col("_n") > hot_threshold).select(user_col)
    # aggregate-derived handful of keys: force the broadcast so both
    # routing joins stay shuffle-free
    ev_hot = ev.join(F.broadcast(hot), user_col, "left_semi")
    ev_norm = ev.join(F.broadcast(hot), user_col, "left_anti")
    plain = _plain_sessions(ev_norm, user_col, ts_col, order_col, gap_s)
    chunk = _chunked_sessions(
        ev_hot, user_col, ts_col, order_col, gap_s, slice_s
    )
    return plain.unionByName(chunk)
