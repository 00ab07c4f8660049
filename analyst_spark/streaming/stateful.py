"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state escape hatch for semantics session_window can't
express (the Spark analog of a stateful plugin transform).

Example operator: per-user running counters (events seen, value sum)
emitted on every trigger, state expiring after inactivity via
processing-time timeout. Arrow-batched; state is a tuple, not a
pickled object graph, so it stays compact at 10⁸ users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(key, pdfs, state: GroupState):
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(60 * 60 * 1000)  # 1h inactivity expiry
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user totals (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
