"""Merge/upsert: last-write-wins key merge of an updates batch into a
base relation — the incremental-maintenance primitive the reference's
INSERT-only SQL destination lacks (engine/sql_dest.go:70-192 can only
append; updating required hand-written EXEC DML).

Expressed as anti-join + union: rows of ``base`` whose key collides
with ``updates`` are replaced, everything else passes through. Both
legs are narrow over the same scan of base; the anti join shuffles on
the merge key — at scale, if base is bucketed on the key
(operators/bucketed.py) the anti join co-locates and the merge is
shuffle-free on the base side, which is what an incremental 100 TB
table maintenance loop needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(base: DataFrame, updates: DataFrame, keys: str | list[str]) -> DataFrame:
    """Return ``base`` with ``updates`` applied (update-or-insert by
    ``keys``). Schemas must be union-compatible by name. If
    ``updates`` carries several rows per key, de-duplicate upstream —
    this operator replaces wholesale per key."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    kept = base.join(updates.select(*key_list).distinct(), on=key_list, how="left_anti")
    return kept.unionByName(updates)
