"""Shared DuckDB-oracle SQL devices.

DuckDB has no base-conversion builtin, so every oracle that needs
Spark's ``conv(substring(x, 1, k), 16, 10)`` parses the hex digits
positionally (strpos into the hex alphabet) and Horner-sums them.
Four modules had accumulated private copies of that device (r12
review — the same copy-accumulation the _qc_margin_ctes fix named);
this module is the single definition they converge on, so a change
to the parse can never land in some oracles and not others.
"""

from __future__ import annotations


def hex_digit(col_expr: str, d: int) -> str:
    """Value (0-15) of the ``d``-th (0-based) hex digit of
    ``col_expr`` — lowercase hex, as md5() emits in both engines."""
    return (
        f"(strpos('0123456789abcdef', substr({col_expr}, {d + 1}, 1)) - 1)"
    )


def hex_prefix_horner(col_expr: str, digits: int) -> str:
    """The first ``digits`` hex digits of ``col_expr`` as an integer:
    the DuckDB twin of Spark's ``conv(substring(x, 1, digits), 16,
    10)``. 8 digits = the 32-bit prefix the minhash/simhash/shuffle
    devices key on; fits BIGINT for digits <= 15."""
    return " + ".join(
        f"{hex_digit(col_expr, d)} * {16 ** (digits - 1 - d)}"
        for d in range(digits)
    )
