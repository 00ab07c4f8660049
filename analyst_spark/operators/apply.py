"""APPLY / CAST — per-row projection with the reference's cast matrix.

The reference's only scalar function is CAST with three targets
(transforms/cast.go:10-84):

* ``int``     — from int/float/string; time → epoch seconds;
                bool → 0/1; nil → nil.
* ``varchar`` — from anything; time → RFC3339(Nano); bool →
                "true"/"false"; float → ``%f`` (6 decimal places).
* ``datetime``— from string via the three accepted layouts
                (transforms/common.go:13-31: RFC3339, RFC3339Nano,
                ``2006-01-02T15:04:05Z``); int = epoch seconds.

Everything is a Catalyst expression — stays inside whole-stage
codegen, no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_int(col: Column | str) -> Column:
    # Timestamp-shaped strings → epoch seconds; else numeric cast.
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.try_cast("timestamp").isNotNull() & c.cast("string").rlike(r"^\d{4}-"),
               F.unix_timestamp(c.try_cast("timestamp")))
        .otherwise(c.cast("long"))
    )


def to_varchar(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def to_datetime(col: Column | str) -> Column:
    """String (3 layouts, all RFC3339-shaped) or epoch-seconds int →
    timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        c.try_cast("timestamp"),
        F.to_timestamp(F.from_unixtime(c.try_cast("long"))),
    )


_CASTS = {
    "int": to_int,
    "varchar": to_varchar,
    "datetime": to_datetime,
}


def typed_to_int(c: Column, dtype: T.DataType) -> Column:
    """Schema-aware CAST(x AS INT) matching transforms/cast.go:13-38."""
    if isinstance(dtype, T.TimestampType):
        return F.unix_timestamp(c)
    if isinstance(dtype, T.BooleanType):
        return F.when(c, 1).otherwise(0).cast("long")
    return c.cast("long")


def typed_to_varchar(c: Column, dtype: T.DataType) -> Column:
    """CAST(x AS VARCHAR) matching transforms/cast.go:40-62:
    time → RFC3339Nano, bool → true/false, float → '%f'."""
    if isinstance(dtype, T.TimestampType):
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    if isinstance(dtype, T.BooleanType):
        return F.when(c, "true").otherwise("false")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.format_number(c, 6).replace(",", "")  # %f = 6 dp
    return c.cast("string")


def apply_cast(
    df: DataFrame,
    projections: Sequence[tuple[str, str | None, str | None]],
) -> DataFrame:
    """``APPLY col [CAST(col AS T)] [AS alias], ...``
    (transforms/apply.go:81-132).

    projections — (column, cast_type_or_None, alias_or_None) triples.
    Schema-aware: uses the input dtype to pick the exact conversion
    the reference's dynamic type switch would.
    """
    dtypes = dict(df.dtypes)
    schema = {f.name.lower(): f.dataType for f in df.schema.fields}
    out = []
    for col, cast_to, alias in projections:
        c = F.col(col)
        if cast_to is not None:
            ct = cast_to.lower()
            dtype = schema.get(col.lower(), T.StringType())
            if ct == "int":
                c = typed_to_int(c, dtype)
            elif ct == "varchar":
                c = typed_to_varchar(c, dtype)
            elif ct == "datetime":
                c = to_datetime(c)
            else:
                raise ValueError(f"unknown cast target {cast_to!r}")
        out.append(c.alias(alias or col))
    return df.select(*out)
