"""Built-in transform grammars (transforms/transforms.go:20-30
dispatches on the first word; participle grammars in
transforms/{aggregate,lookup,apply}.go re-expressed here).

  AGGREGATE term [AS alias], ... [GROUP BY col, ...]
      term := column | FN(arg, ...) ; args are column refs or
      string/number literals (static args bound at plan time,
      transforms/aggregate.go:287-324)
  LOOKUP col [AS alias], ... FROM Base {INNER|OUTER} JOIN Lkp
      ON a.x = b.y [AND ...]
  APPLY col [AS alias] | CAST(col AS TYPE) [AS alias], ...

Each parse returns a plan-builder closure over DataFrames — the
compile step; Catalyst handles everything physical.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analyst_spark.operators.aggregate import cdf, quantile
from analyst_spark.operators.apply import apply_cast
from analyst_spark.operators.lookup import lookup_join
from analyst_spark.operators.zoh import zoh_mean

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*') |
        (?P<num>-?\d+(?:\.\d+)?) |
        (?P<word>[A-Za-z_][\w]*) |
        (?P<punct>[(),.*=])
    )""",
    re.VERBOSE,
)


def _tokenize(body: str) -> list[tuple[str, str]]:
    toks = []
    pos = 0
    body = body.strip()
    while pos < len(body):
        m = _TOKEN_RE.match(body, pos)
        if not m:
            raise SyntaxError(f"bad token near {body[pos:pos+30]!r}")
        pos = m.end()
        for kind in ("str", "num", "word", "punct"):
            if m.group(kind) is not None:
                toks.append((kind, m.group(kind)))
                break
    return toks


class _TokStream:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def accept_word(self, *words):
        kind, val = self.peek()
        if kind == "word" and val.upper() in words:
            self.i += 1
            return val.upper()
        return None

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise SyntaxError(f"expected {val or kind}, got {v!r}")
        return v

    def at_end(self):
        return self.i >= len(self.toks)


@dataclass
class AggTerm:
    column: str | None = None
    fn: str | None = None
    args: list | None = None  # ('col', name) | ('lit', value)
    alias: str | None = None


def parse_aggregate(body: str) -> tuple[list[AggTerm], list[str]]:
    ts = _TokStream(_tokenize(body))
    ts.expect("word")  # AGGREGATE
    terms: list[AggTerm] = []
    while True:
        kind, val = ts.next()
        if kind != "word":
            raise SyntaxError(f"expected term, got {val!r}")
        term = AggTerm()
        if ts.peek() == ("punct", "("):
            ts.next()
            term.fn = val.upper()
            term.args = []
            while ts.peek() != ("punct", ")"):
                k, v = ts.next()
                if k == "word":
                    term.args.append(("col", v))
                elif k == "num":
                    term.args.append(("lit", float(v) if "." in v else int(v)))
                elif k == "str":
                    term.args.append(("lit", v[1:-1].replace("''", "'")))
                else:
                    raise SyntaxError(f"bad aggregate arg {v!r}")
                if ts.peek() == ("punct", ","):
                    ts.next()
            ts.expect("punct", ")")
        else:
            term.column = val
        if ts.accept_word("AS"):
            k, v = ts.next()
            term.alias = v[1:-1] if k == "str" else v
        terms.append(term)
        if ts.peek() == ("punct", ","):
            ts.next()
            continue
        break
    group_by: list[str] = []
    if ts.accept_word("GROUP"):
        if not ts.accept_word("BY"):
            raise SyntaxError("expected BY after GROUP")
        group_by.append(ts.expect("word"))
        while ts.peek() == ("punct", ","):
            ts.next()
            group_by.append(ts.expect("word"))
    if not ts.at_end():
        raise SyntaxError(f"trailing tokens in AGGREGATE: {ts.peek()[1]!r}")
    # bare columns must appear in GROUP BY (aggregate.go:366-371)
    gb_lower = {g.lower() for g in group_by}
    for t in terms:
        if t.column and t.column.lower() not in gb_lower:
            raise SyntaxError(
                f"column {t.column!r} must appear in GROUP BY"
            )
    return terms, group_by


_SIMPLE_REDUCERS = {"SUM", "AVG", "MIN", "MAX", "COUNT"}


def build_aggregate(df: DataFrame, body: str) -> DataFrame:
    terms, group_by = parse_aggregate(body)
    zoh_terms = [t for t in terms if t.fn == "ZOH"]
    if len(zoh_terms) > 1:
        raise SyntaxError("at most one ZOH term per AGGREGATE")
    if zoh_terms:
        t = zoh_terms[0]
        (k1, time_col), (k2, value_col), (k3, start), (k4, finish) = t.args
        if (k1, k2, k3, k4) != ("col", "col", "lit", "lit"):
            raise SyntaxError("ZOH(time_col, value_col, 'start', 'finish')")
        out = zoh_mean(
            df, group_by, time_col, value_col, str(start), str(finish),
            alias=t.alias or "zoh",
        )
        others = [x for x in terms if x is not t and x.fn]
        if others:
            extra = df.groupBy(*group_by).agg(
                *[_agg_expr(x) for x in others]
            )
            out = out.join(extra, group_by, "inner")
        return out
    exprs = [_agg_expr(t) for t in terms if t.fn]
    if group_by:
        if not exprs:
            # every projected column is a group key — one row per
            # group, no measures (compiler_test.go
            # TestCompilerWithEmail: AGGREGATE a, b GROUP BY a, b)
            return df.select(*group_by).distinct()
        return df.groupBy(*group_by).agg(*exprs)
    return df.agg(*exprs)


def _agg_expr(t: AggTerm) -> Column:
    alias = t.alias or t.fn.lower()
    args = t.args or []
    if t.fn in _SIMPLE_REDUCERS:
        if t.fn == "COUNT":
            # arg ignored; COUNT(1) idiom (docs/transforms.md). Output
            # double like every reference reducer.
            return F.count(F.lit(1)).cast("double").alias(alias)
        if not args or args[0][0] != "col":
            raise SyntaxError(f"{t.fn} takes a column argument")
        col = F.col(args[0][1]).cast("double")
        return {
            "SUM": F.sum,
            "AVG": F.avg,
            "MIN": F.min,
            "MAX": F.max,
        }[t.fn](col).alias(alias)
    if t.fn == "QUANTILE":
        (k1, col), (k2, q) = args
        return F.round(quantile(col, float(q)), 9).alias(alias)
    if t.fn == "CDF":
        (k1, col), (k2, v) = args
        return cdf(col, float(v)).alias(alias)
    raise SyntaxError(f"unknown aggregate function {t.fn!r}")


@dataclass
class LookupSpec:
    projections: list[tuple[str, str, str | None]]  # (qualifier, col, alias)
    base: str
    lookup: str
    how: str
    on: list[tuple[str, str, str, str]]  # (tbl_a, col_a, tbl_b, col_b)


def parse_lookup(body: str) -> LookupSpec:
    ts = _TokStream(_tokenize(body))
    ts.expect("word")  # LOOKUP
    projections = []
    while True:
        name = ts.expect("word")
        qual = None
        if ts.peek() == ("punct", "."):
            ts.next()
            qual, name = name, ts.expect("word")
        alias = None
        if ts.accept_word("AS"):
            k, v = ts.next()
            alias = v[1:-1] if k == "str" else v
        projections.append((qual, name, alias))
        if ts.peek() == ("punct", ","):
            ts.next()
            continue
        break
    if not ts.accept_word("FROM"):
        raise SyntaxError("expected FROM in LOOKUP")
    base = ts.expect("word")
    how = ts.accept_word("INNER", "OUTER")
    if not how:
        raise SyntaxError("expected INNER or OUTER join")
    if not ts.accept_word("JOIN"):
        raise SyntaxError("expected JOIN")
    lookup = ts.expect("word")
    if not ts.accept_word("ON"):
        raise SyntaxError("expected ON")
    on = []
    while True:
        t1 = ts.expect("word"); ts.expect("punct", "."); c1 = ts.expect("word")
        ts.expect("punct", "=")
        t2 = ts.expect("word"); ts.expect("punct", "."); c2 = ts.expect("word")
        on.append((t1, c1, t2, c2))
        if not ts.accept_word("AND"):
            break
    if not ts.at_end():
        raise SyntaxError("trailing tokens in LOOKUP")
    return LookupSpec(projections, base, lookup, how.lower(), on)


def build_lookup(
    base_df: DataFrame,
    lookup_df: DataFrame,
    spec: LookupSpec,
    order_col: str | None = None,
) -> DataFrame:
    """LOOKUP semantics via operators.lookup_join. The reference's
    'last row wins' needs an ordering column for determinism
    (SURVEY §7.3); None still collapses to one row per key — the
    greatest whole-row tuple wins (see lookup_join)."""
    pairs = []
    for t1, c1, t2, c2 in spec.on:
        if t1.lower() == spec.base.lower():
            pairs.append((c1, c2))
        elif t2.lower() == spec.base.lower():
            pairs.append((c2, c1))
        else:
            raise SyntaxError(
                f"join condition {t1}.{c1}={t2}.{c2} references neither side"
            )
    base_cols = {c.lower() for c in base_df.columns}
    select = {}
    for qual, col, alias in spec.projections:
        from_lookup = (
            (qual and qual.lower() == spec.lookup.lower())
            or (not qual and col.lower() not in base_cols)
        )
        if from_lookup:
            select[col] = alias or col
    out = lookup_join(
        base_df,
        lookup_df,
        on=pairs,
        select=select,
        how={"inner": "inner", "outer": "outer"}[spec.how],
        order_col=order_col,
    )
    # project to the declared column list, base columns included
    final = []
    for qual, col, alias in spec.projections:
        if col in select:
            final.append(F.col(select[col]))
        else:
            final.append(F.col(col).alias(alias or col))
    return out.select(*final)


@dataclass
class AsofSpec:
    values: list[tuple[str, str | None]]  # (right value col, alias)
    base: str
    right: str
    on: list[tuple[str, str, str, str]]
    time_col: str


def parse_asof(body: str) -> AsofSpec:
    """Engine extension beyond the reference grammar:

        ASOF val [AS alias], ... FROM Base JOIN Right
            ON base.k = right.k [AND ...] [TIME tscol]

    For each base row, attach the Right value columns of the latest
    Right row with the same key(s) and ``tscol`` (default ``ts``)
    at-or-before the base row's."""
    ts = _TokStream(_tokenize(body))
    ts.expect("word")  # ASOF
    values = []
    while True:
        name = ts.expect("word")
        alias = None
        if ts.accept_word("AS"):
            k, v = ts.next()
            alias = v[1:-1] if k == "str" else v
        values.append((name, alias))
        if ts.peek() == ("punct", ","):
            ts.next()
            continue
        break
    if not ts.accept_word("FROM"):
        raise SyntaxError("expected FROM in ASOF")
    base = ts.expect("word")
    if not ts.accept_word("JOIN"):
        raise SyntaxError("expected JOIN in ASOF")
    right = ts.expect("word")
    if not ts.accept_word("ON"):
        raise SyntaxError("expected ON in ASOF")
    on = []
    while True:
        t1 = ts.expect("word"); ts.expect("punct", "."); c1 = ts.expect("word")
        ts.expect("punct", "=")
        t2 = ts.expect("word"); ts.expect("punct", "."); c2 = ts.expect("word")
        on.append((t1, c1, t2, c2))
        if not ts.accept_word("AND"):
            break
    time_col = "ts"
    if ts.accept_word("TIME"):
        time_col = ts.expect("word")
    if not ts.at_end():
        raise SyntaxError("trailing tokens in ASOF")
    return AsofSpec(values, base, right, on, time_col)


def build_asof(base_df: DataFrame, right_df: DataFrame, spec: AsofSpec) -> DataFrame:
    from analyst_spark.operators.asof import asof_join

    right = right_df
    by_cols = []
    for t1, c1, t2, c2 in spec.on:
        if t1.lower() == spec.base.lower():
            bcol, rcol = c1, c2
        elif t2.lower() == spec.base.lower():
            bcol, rcol = c2, c1
        else:
            raise SyntaxError(
                f"join condition {t1}.{c1}={t2}.{c2} references neither side"
            )
        if rcol.lower() != bcol.lower():
            right = right.withColumnRenamed(rcol, bcol)
        by_cols.append(bcol)
    value_cols = [v for v, _ in spec.values]
    out = asof_join(
        base_df, right, ts_col=spec.time_col,
        by_cols=by_cols, value_cols=value_cols,
    )
    keep = [F.col(c) for c in base_df.columns]
    keep += [
        F.col(v + "_asof").alias(alias or v) for v, alias in spec.values
    ]
    return out.select(*keep)


def parse_apply(body: str) -> list[tuple[str, str | None, str | None]]:
    ts = _TokStream(_tokenize(body))
    ts.expect("word")  # APPLY
    projections = []
    while True:
        kind, val = ts.next()
        if kind != "word":
            raise SyntaxError(f"expected projection, got {val!r}")
        if val.upper() == "CAST":
            ts.expect("punct", "(")
            col = ts.expect("word")
            if not ts.accept_word("AS"):
                raise SyntaxError("expected AS in CAST")
            typ = ts.expect("word").lower()
            ts.expect("punct", ")")
            alias = None
            if ts.accept_word("AS"):
                k, v = ts.next()
                alias = v[1:-1] if k == "str" else v
            projections.append((col, typ, alias))
        else:
            alias = None
            if ts.accept_word("AS"):
                k, v = ts.next()
                alias = v[1:-1] if k == "str" else v
            projections.append((val, None, alias))
        if ts.peek() == ("punct", ","):
            ts.next()
            continue
        break
    if not ts.at_end():
        raise SyntaxError("trailing tokens in APPLY")
    return projections


def build_apply(df: DataFrame, body: str) -> DataFrame:
    return apply_cast(df, parse_apply(body))


def dispatch(body: str) -> str:
    """First word selects the builtin (transforms/transforms.go:20-30).
    ASOF and DEDUP are engine extensions."""
    word = body.strip().split(None, 1)[0].upper()
    if word not in ("AGGREGATE", "LOOKUP", "APPLY", "ASOF", "DEDUP"):
        raise SyntaxError(f"unknown transform {word!r}")
    return word


@dataclass
class DedupSpec:
    keys: list[str]
    keep: str          # 'first' | 'last'
    order_col: str


def parse_dedup(body: str) -> DedupSpec:
    """Engine extension beyond the reference grammar:

        DEDUP ON key [, key ...] KEEP {FIRST|LAST} BY ordcol

    One surviving row per key combination: the row whose ``ordcol`` is
    smallest (FIRST) or largest (LAST). The order column is REQUIRED —
    a distributed scan has no stable arrival order, so "keep the first
    seen" would be nondeterministic (the same reasoning as LOOKUP's
    explicit ORDER_BY)."""
    ts = _TokStream(_tokenize(body))
    ts.expect("word")  # DEDUP
    if not ts.accept_word("ON"):
        raise SyntaxError("expected ON after DEDUP")
    keys = [ts.expect("word")]
    while ts.peek() == ("punct", ","):
        ts.next()
        keys.append(ts.expect("word"))
    if not ts.accept_word("KEEP"):
        raise SyntaxError("expected KEEP in DEDUP")
    mode = ts.expect("word").lower()
    if mode not in ("first", "last"):
        raise SyntaxError("expected FIRST or LAST after KEEP")
    if not ts.accept_word("BY"):
        raise SyntaxError("expected BY <order column> in DEDUP")
    order_col = ts.expect("word")
    if not ts.at_end():
        raise SyntaxError(f"unexpected trailing tokens in DEDUP: {ts.peek()!r}")
    return DedupSpec(keys=keys, keep=mode, order_col=order_col)


def build_dedup(df: DataFrame, spec: DedupSpec) -> DataFrame:
    """One aggregation, no window: min_by/max_by of the full row
    struct over the order column per key — the same
    map-side-combinable shape exact_dedup uses, so it survives skewed
    keys the way a row_number window (sort per key) would not. Ties on
    the order column break by the smallest/largest remaining row
    struct, making the survivor a total function of the data."""
    from pyspark.sql import functions as F

    # AQL identifiers are case-insensitive (like every other reference
    # construct): resolve the script's key/order spellings to the
    # frame's actual column names so the key can never leak into the
    # payload struct as a duplicate column
    by_lower = {c.lower(): c for c in df.columns}
    try:
        keys = [by_lower[k.lower()] for k in spec.keys]
        order_col = by_lower[spec.order_col.lower()]
    except KeyError as e:
        raise ValueError(f"DEDUP references unknown column {e.args[0]!r}")
    # DEDUP ON k, K resolves to the same column twice — collapse to
    # one groupBy key instead of emitting a duplicate output column
    keys = list(dict.fromkeys(keys))
    spec = DedupSpec(keys=keys, keep=spec.keep, order_col=order_col)
    others = [c for c in df.columns if c not in spec.keys]
    # a NULL order value has no defined position in KEEP FIRST/LAST
    # (struct min/max sorts nulls FIRST while a row_number ... DESC
    # oracle sorts them LAST) — fail loudly instead of silently
    # diverging; the check is a row-local expression, no extra pass
    ord_checked = F.when(
        F.col(spec.order_col).isNotNull(), F.col(spec.order_col)
    ).otherwise(
        F.raise_error(
            F.lit(f"DEDUP order column {spec.order_col!r} is NULL")
        )
    )
    # the order column leads the struct (as __ord) so comparison
    # prioritizes it; it also appears among the payload fields so the
    # survivor row carries it through
    row = F.struct(
        ord_checked.alias("__ord"),
        *[F.col(c).alias(c) for c in others],
    )
    agg = F.min(row) if spec.keep == "first" else F.max(row)
    picked = df.groupBy(*spec.keys).agg(agg.alias("__row"))
    return picked.select(
        *spec.keys, *[F.col(f"__row.{c}").alias(c) for c in others]
    )
