"""LOOKUP — the reference's single join operator, Spark-first.

Reference semantics (transforms/lookup.go:109-213): the lookup side is
fully drained into an in-process hash map keyed by the join columns —
**duplicate keys: last row wins** (lookup.go:50, :185-188) — then base
rows probe it. INNER drops unmatched base rows; OUTER is a *left*
outer (lookup.go:232-236). Equi-join only.

Spark mapping: dedup the lookup side to one row per key, then join.
The dedup must be deterministic — the reference's "last" is stream
arrival order, which has no distributed analog — so the caller names
an ordering column and we take ``max_by(col, order_col)`` per key
(SURVEY §7.3). ``broadcast=True`` (default) mirrors the reference's
design constraint — the lookup side must fit in memory there too
(lookup.go drains it into one process map) — and removes the shuffle
entirely. The hint FORCES the broadcast, so for a lookup side too
big to ship (possible here, impossible in the reference), pass
``broadcast=False`` to get a shuffled hash join instead.

At 100 TB: base-side stays un-shuffled when broadcast applies; the
dedup aggregation is map-side-combined on the (small) lookup side.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join(
    base: DataFrame,
    lookup: DataFrame,
    on: Sequence[tuple[str, str]],
    select: Mapping[str, str] | None = None,
    how: str = "inner",
    order_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """``LOOKUP cols FROM base {INNER|OUTER} JOIN lookup ON ...``.

    on        — [(base_col, lookup_col), ...] equi-key pairs.
    select    — {lookup_col: alias} projection of lookup-side columns
                (reference grammar's per-column AS aliases).
    how       — 'inner' | 'outer' (outer == LEFT outer, lookup.go:232).
    order_col — lookup-side column defining which duplicate "wins"
                (max wins). None → duplicates still collapse to one
                row per key (reference lookup.go:185-188 stores one
                row per key); the winner is the greatest whole-row
                tuple, a deterministic stand-in for the reference's
                nondeterministic stream-arrival "last".
    """
    how = {"inner": "inner", "outer": "left"}[how.lower()]
    select = dict(select or {})
    lkeys = [lk for _, lk in on]
    proj_cols = [c for c in select if c not in lkeys]

    lk = lookup
    if order_col is not None:
        lk = lk.groupBy(*lkeys).agg(
            *[F.max_by(c, order_col).alias(c) for c in proj_cols]
        )
    elif proj_cols:
        # One whole row per key: max over a struct keeps columns from
        # the SAME winning row (per-column max would mix rows).
        lk = (
            lk.groupBy(*lkeys)
            .agg(F.max(F.struct(*proj_cols)).alias("__row"))
            .select(*lkeys, *[F.col(f"__row.{c}").alias(c) for c in proj_cols])
        )
    else:
        lk = lk.select(*lkeys).distinct()

    if broadcast:
        lk = F.broadcast(lk)

    cond = None
    for bk, lkc in on:
        c = base[bk] == lk[lkc]
        cond = c if cond is None else (cond & c)

    joined = base.join(lk, cond, how)
    out_cols = [base[c] for c in base.columns]
    out_cols += [lk[c].alias(select.get(c, c)) for c in proj_cols]
    return joined.select(*out_cols)
