"""Parameter-table destination (engine/parameters.go:68-120):
writes the single output row's cells into named parameters by
position. The parameter table itself is a driver-side dict consumed
by USING PARAMETER substitution (engine/sql_source.go:68-81)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def parameter_sink(
    df: DataFrame, names: list[str], params: dict[str, object]
) -> dict[str, object]:
    row = df.first()
    if row is None:
        raise ValueError("parameter destination received no rows")
    if len(names) > len(row):
        raise ValueError(
            f"{len(names)} parameters declared but row has {len(row)} cells"
        )
    for i, name in enumerate(names):
        params[name.lstrip("@")] = row[i]
    return params
