"""Parameter table + destination (engine/parameters.go:1-120):
a case-insensitive name → value store populated from query output and
consumed by USING PARAMETER substitution (engine/sql_source.go:68-81).

Reference semantics ported exactly (engine/parameters_test.go):

* names are case-insensitive everywhere (Declare "Aa" / set "AA" /
  get "BB" all address the same slots);
* duplicate declaration is an error;
* setting an undeclared parameter is an error;
* the destination writes every arriving row in order, so the LAST
  row's cells win (parameters_test.go:48-59: rows (1,2) then (3,4)
  leave Aa=3, Bb=4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ParameterTable(dict):
    """Case-insensitive parameter store. Keys canonicalize to upper
    case internally; iteration yields the first-seen spelling so
    callers (and JobResult consumers) read natural names back."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._display: dict[str, str] = {}
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    def _canon(self, key):
        return key.upper() if isinstance(key, str) else key

    def declare(self, name: str) -> None:
        """Reject duplicate declarations (parameters.go Declare)."""
        c = self._canon(name)
        if c in self._display:
            raise ValueError(f"parameter {name!r} already declared")
        self._display[c] = name
        super().__setitem__(c, None)

    def __setitem__(self, key, value):
        c = self._canon(key)
        self._display.setdefault(c, key)
        super().__setitem__(c, value)

    def __getitem__(self, key):
        return super().__getitem__(self._canon(key))

    def __contains__(self, key):
        return super().__contains__(self._canon(key))

    def get(self, key, default=None):
        return super().get(self._canon(key), default)

    def setdefault(self, key, default=None):
        c = self._canon(key)
        self._display.setdefault(c, key)
        return super().setdefault(c, default)

    def keys(self):
        return [self._display[c] for c in super().keys()]

    def items(self):
        return [(self._display[c], v) for c, v in super().items()]

    def __iter__(self):
        return iter(self.keys())


def parameter_sink(
    df: DataFrame, names: list[str], params: dict[str, object]
) -> dict[str, object]:
    """INTO PARAMETER (@a, @b): positional cells of the LAST output
    row (reference destinations consume the stream in order and each
    row overwrites — parameters_test.go:48-59). ``tail(1)`` preserves
    the frame's natural order for the deterministic single-output
    case the construct exists for. Setting an undeclared parameter is
    an error when the store enforces declarations."""
    rows = df.tail(1)
    if not rows:
        raise ValueError("parameter destination received no rows")
    row = rows[0]
    if len(names) > len(row):
        raise ValueError(
            f"{len(names)} parameters declared but row has {len(row)} cells"
        )
    for i, name in enumerate(names):
        key = name.lstrip("@")
        if isinstance(params, ParameterTable) and key not in params:
            raise KeyError(f"parameter @{key} not declared")
        params[key] = row[i]
    return params
