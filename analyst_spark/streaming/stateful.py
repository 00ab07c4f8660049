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


def _make_update_fn(expire: bool):
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
        if expire:
            state.setTimeoutDuration(60 * 60 * 1000)  # 1h inactivity expiry
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return _update_user_state


def running_user_totals(events: DataFrame, expire: bool = True) -> DataFrame:
    """Continuously-updated per-user totals (update output mode).

    ``expire=True`` (production): processing-time timeout evicts
    inactive users' state. ``expire=False`` (bounded replays): no
    timers, so an availableNow run terminates when the data is
    exhausted — with timers armed, the query would stay alive waiting
    to fire them.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(expire),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if expire
            else GroupStateTimeout.NoTimeout
        ),
    )
