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
    """Case-insensitive parameter store. The underlying dict is keyed
    by the FIRST-SEEN spelling; a side map (canonical upper-case →
    stored spelling) routes every lookup. Storing display spellings in
    the real dict means the C-level fast paths that bypass Python
    overrides — ``dict(pt)``, ``json.dumps(pt)``, ``{**pt}``,
    iteration from C — all see natural names, not canonicalized ones.
    ``update``/``copy``/``pop`` are overridden so mutation goes
    through the canonical map too."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self._index: dict[str, str] = {}  # canon -> stored spelling
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    def _canon(self, key):
        return key.upper() if isinstance(key, str) else key

    def declare(self, name: str) -> None:
        """Reject duplicate declarations (parameters.go Declare)."""
        c = self._canon(name)
        if c in self._index:
            raise ValueError(f"parameter {name!r} already declared")
        self._index[c] = name
        super().__setitem__(name, None)

    def __setitem__(self, key, value):
        c = self._canon(key)
        stored = self._index.setdefault(c, key)
        super().__setitem__(stored, value)

    def __getitem__(self, key):
        c = self._canon(key)
        if c not in self._index:
            raise KeyError(key)
        return super().__getitem__(self._index[c])

    def __delitem__(self, key):
        c = self._canon(key)
        if c not in self._index:
            raise KeyError(key)
        super().__delitem__(self._index.pop(c))

    def __contains__(self, key):
        return self._canon(key) in self._index

    def get(self, key, default=None):
        c = self._canon(key)
        if c not in self._index:
            return default
        return super().__getitem__(self._index[c])

    def setdefault(self, key, default=None):
        c = self._canon(key)
        if c in self._index:
            return super().__getitem__(self._index[c])
        self[key] = default
        return default

    def pop(self, key, *default):
        c = self._canon(key)
        if c not in self._index:
            if default:
                return default[0]
            raise KeyError(key)
        return super().pop(self._index.pop(c))

    def update(self, *args, **kwargs):
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    def clear(self):
        super().clear()
        self._index.clear()

    def popitem(self):
        stored, v = super().popitem()
        self._index.pop(self._canon(stored), None)
        return stored, v

    def copy(self) -> "ParameterTable":
        out = ParameterTable()
        out._index = dict(self._index)
        for stored, v in super().items():
            dict.__setitem__(out, stored, v)
        return out


def parameter_sink(
    df: DataFrame, names: list[str], params: dict[str, object]
) -> dict[str, object]:
    """INTO PARAMETER (@a, @b): positional cells of the LAST output
    row (reference destinations consume the stream in order and each
    row overwrites — parameters_test.go:48-59). EVERY row must match
    the declared arity: the reference flags each arriving row whose
    cell count differs from the parameter list
    (engine/parameters.go:100-108), in both directions, so a wider
    row or an early malformed row is an error here too. Parameter
    streams are single/few rows by construction, so collecting them
    is bounded. Setting an undeclared parameter is an error when the
    store enforces declarations."""
    rows = df.collect()
    if not rows:
        raise ValueError("parameter destination received no rows")
    for i, r in enumerate(rows):
        if len(r) != len(names):
            raise ValueError(
                f"row {i}: {len(names)} parameters declared but row "
                f"has {len(r)} cells"
            )
    row = rows[-1]
    for i, name in enumerate(names):
        key = name.lstrip("@")
        if isinstance(params, ParameterTable) and key not in params:
            raise KeyError(f"parameter @{key} not declared")
        params[key] = row[i]
    return params
