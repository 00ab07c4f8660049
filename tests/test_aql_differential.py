"""Differential AQL fuzzing against a DuckDB oracle (VERDICT r7 #2).

test_parser_fuzz.py fuzzes the PARSER; this fuzzes the ENGINE: each
seed generates a random small AQL pipeline (literal DATA sources ->
AGGREGATE / LOOKUP / APPLY / SQL-filter compositions with random
options) plus an equivalent DuckDB query built from the SAME spec,
runs both, and compares the result multisets. This is the automated
form of the r7 hand-driven parser-vs-engine cross-check that found
the USING-PARAMETER-on-EXEC and QUERY-FROM-BLOCK parity bugs.

Determinism contract of the generated programs (so the comparison is
exact, not approximate):

* every double is a quarter (m/4) -> sums/avgs/quantile interpolation
  are exact in binary regardless of summation order;
* LOOKUP tables carry unique keys about half the time; the other
  half generates DUPLICATE keys on purpose, engaging the engine's
  deterministic stand-in for the reference's last-row-wins dedup
  (greatest projected-column tuple wins, operators/lookup.py) —
  mirrored in the oracle as a row_number() OVER (PARTITION BY keys
  ORDER BY kept-cols DESC) = 1 subquery. Duplicate-key rows are
  non-NULL so tuple comparison is total on both engines;
* source join/group KEYS go NULL ~8% of the time (r8): a NULL key
  never matches a LOOKUP and forms its own GROUP BY group — SQL
  semantics on both engines; lookup-side keys stay non-NULL so the
  last-wins dedup partition is well-defined;
* aggregate outputs are normalized (3.0 == 3) before comparison, so
  reducer double-casting differences are absorbed.

Seeds are pinned; a failure prints the seed, the AQL script, and the
oracle SQL so it can be replayed verbatim.
"""

from __future__ import annotations

import json
import math
import random

import duckdb
import pytest

from analyst_spark.aql import execute_script

# ---------------------------------------------------------------- data gen

VOCAB = ["alpha", "beta", "gamma", "delta", "omega"]

# column kinds: 'int' | 'float' | 'str'
SRC_COLS = [("k", "int"), ("k2", "int"), ("v", "float"), ("s", "str")]
LKP_COLS = [("k", "int"), ("k2", "int"), ("lv", "float"), ("ls", "str")]


def _quarter(rng: random.Random) -> float:
    return rng.randint(-40, 40) / 4.0


def gen_src_rows(rng: random.Random) -> list[list]:
    if rng.random() < 0.05:
        return []
    n = rng.randint(1, 16)
    rows = []
    for i in range(n):
        v = None if (i > 0 and rng.random() < 0.15) else _quarter(rng)
        s = None if rng.random() < 0.1 else rng.choice(VOCAB)
        # NULL join/group keys (r8): a NULL key must never match a
        # LOOKUP (SQL equi-join semantics on both engines) and must
        # form its own GROUP BY group; keep row 0 non-NULL so the
        # engine's JSON schema inference always sees an int
        k = None if (i > 0 and rng.random() < 0.08) else rng.randint(0, 4)
        rows.append([k, rng.randint(0, 2), v, s])
    return rows


def gen_lkp_rows(rng: random.Random) -> list[list]:
    keys = rng.sample(range(0, 5), rng.randint(1, 4))  # partial coverage
    rows = [
        [k, rng.randint(0, 2), _quarter(rng), rng.choice(VOCAB)]
        for k in sorted(keys)
    ]
    if rng.random() < 0.5:
        # duplicate keys: single-key lookups MUST dedup (the r8
        # fuzz extension); values stay non-NULL so the greatest-tuple
        # winner is total on both engines
        for _ in range(rng.randint(1, 3)):
            donor = rng.choice(rows)
            rows.append(
                [donor[0], donor[1] if rng.random() < 0.5 else rng.randint(0, 2),
                 _quarter(rng), rng.choice(VOCAB)]
            )
    return rows


def _duck_ty(kind: str) -> str:
    return {"int": "BIGINT", "float": "DOUBLE", "str": "VARCHAR"}[kind]


def _duck_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def duck_table_sql(rows: list[list], cols: list[tuple[str, str]]) -> str:
    if not rows:
        sel = ", ".join(
            f"CAST(NULL AS {_duck_ty(k)}) AS {n}" for n, k in cols
        )
        return f"SELECT {sel} WHERE FALSE"
    vals = ", ".join(
        "(" + ", ".join(_duck_lit(v) for v in r) + ")" for r in rows
    )
    names = ", ".join(n for n, _ in cols)
    sel = ", ".join(f"CAST({n} AS {_duck_ty(k)}) AS {n}" for n, k in cols)
    return f"SELECT {sel} FROM (VALUES {vals}) AS _t({names})"


# ---------------------------------------------------------------- stage gen
#
# Each stage emits (aql_block_text, duck_cte_select, out_cols); the
# pipeline is a linear chain Src -> stage1 -> ... -> stageN with Lkp
# available to LOOKUP stages.


def gen_agg(rng: random.Random, prev: str, name: str, cols):
    numeric = [n for n, k in cols if k in ("int", "float")]
    if not numeric:
        return None
    group_pool = [n for n, _ in cols]
    n_group = rng.choice([0, 1, 1, 2])
    group = rng.sample(group_pool, min(n_group, len(group_pool)))
    terms_aql, terms_sql, aliases = [], [], []
    for i in range(rng.randint(1, 3)):
        col = rng.choice(numeric)
        fn = rng.choice(["SUM", "AVG", "MIN", "MAX", "COUNT", "QUANTILE", "CDF"])
        # stage-qualified alias: group keys are prior-stage aliases, so
        # a bare "a0" could collide with a group column (DuckDB would
        # emit a renamed duplicate, Spark a dup name — both engines'
        # outputs diverge on an ill-formed projection, which is not
        # the parity under test)
        alias = f"{name.lower()}a{i}"
        aliases.append(alias)
        if fn == "COUNT":
            terms_aql.append(f"COUNT({col}) AS {alias}")
            terms_sql.append(f"count(*) AS {alias}")
        elif fn == "QUANTILE":
            q = rng.choice([0.25, 0.5, 0.75])
            terms_aql.append(f"QUANTILE({col}, {q}) AS {alias}")
            terms_sql.append(
                f"round(quantile_cont(CAST({col} AS DOUBLE), {q}), 9) AS {alias}"
            )
        elif fn == "CDF":
            x = _quarter(rng)
            terms_aql.append(f"CDF({col}, {x}) AS {alias}")
            terms_sql.append(
                f"avg(CASE WHEN {col} IS NULL THEN NULL "
                f"WHEN CAST({col} AS DOUBLE) <= {x} THEN 1.0 ELSE 0.0 END) "
                f"AS {alias}"
            )
        else:
            terms_aql.append(f"{fn}({col}) AS {alias}")
            terms_sql.append(f"{fn.lower()}(CAST({col} AS DOUBLE)) AS {alias}")
    # sometimes also list a bare group column as a term (legal iff
    # it appears in GROUP BY; output position is the groupBy's)
    if group and rng.random() < 0.3:
        terms_aql.insert(0, group[0])
    aql_terms = ", ".join(terms_aql)
    gb = f" GROUP BY {', '.join(group)}" if group else ""
    aql = (
        f"TRANSFORM '{name}' FROM BLOCK {prev} (\n"
        f"    AGGREGATE {aql_terms}{gb}\n)"
    )
    sel = ", ".join(group + terms_sql)
    sql = f"SELECT {sel} FROM {prev.lower()}" + (
        f" GROUP BY {', '.join(group)}" if group else ""
    )
    out_cols = [(g, dict(cols)[g]) for g in group] + [
        (a, "float") for a in aliases
    ]
    return aql, sql, out_cols


def gen_lookup(rng: random.Random, prev: str, name: str, cols):
    names = [n for n, _ in cols]
    if "k" not in names:
        return None
    # multi-key join when the base still carries k2 (r8 extension)
    join_keys = ["k"]
    if "k2" in names and rng.random() < 0.4:
        join_keys = ["k", "k2"]
    how = rng.choice(["INNER", "OUTER"])
    base_keep = [
        n for n, _ in cols if rng.random() < 0.8 or n in join_keys
    ]
    lkp_cols = [("lv", "float"), ("ls", "str")]
    lkp_keep = [c for c in lkp_cols if rng.random() < 0.8] or [lkp_cols[0]]
    # stage-qualified aliases so chained LOOKUPs never project two
    # columns with the same name (ill-formed either engine)
    proj_aql = [f"{prev}.{c}" for c in base_keep] + [
        f"Lkp.{n} AS {n}_{name.lower()}" for n, _ in lkp_keep
    ]
    on_aql = " AND ".join(f"{prev}.{k} = Lkp.{k}" for k in join_keys)
    aql = (
        f"TRANSFORM '{name}' FROM BLOCK {prev}, BLOCK Lkp (\n"
        f"    LOOKUP {', '.join(proj_aql)}\n"
        f"    FROM {prev} {how} JOIN Lkp ON {on_aql}\n)"
    )
    join = {"INNER": "JOIN", "OUTER": "LEFT JOIN"}[how]
    # the engine collapses duplicate lookup keys to ONE row per key —
    # greatest tuple of the PROJECTED columns wins (operators/
    # lookup.py greatest-whole-row dedup); mirror it exactly
    kept = ", ".join(n for n, _ in lkp_keep)
    order = ", ".join(f"{n} DESC" for n, _ in lkp_keep)
    part = ", ".join(join_keys)
    dedup = (
        f"(SELECT {part}, {kept} FROM (SELECT *, row_number() OVER "
        f"(PARTITION BY {part} ORDER BY {order}) AS __rn FROM lkp) "
        f"WHERE __rn = 1)"
    )
    sel = ", ".join(
        [f"p.{c}" for c in base_keep]
        + [f"l.{n} AS {n}_{name.lower()}" for n, _ in lkp_keep]
    )
    on_sql = " AND ".join(f"p.{k} = l.{k}" for k in join_keys)
    sql = f"SELECT {sel} FROM {prev.lower()} p {join} {dedup} l ON {on_sql}"
    out_cols = [(n, dict(cols)[n]) for n in base_keep] + [
        (f"{n}_{name.lower()}", k) for n, k in lkp_keep
    ]
    return aql, sql, out_cols


def gen_apply(rng: random.Random, prev: str, name: str, cols):
    keep = [c for c in cols if rng.random() < 0.8] or [cols[0]]
    proj_aql, proj_sql, out_cols = [], [], []
    for n, k in keep:
        if k == "int" and rng.random() < 0.4:
            proj_aql.append(f"CAST({n} AS varchar) AS {n}s_{name.lower()}")
            proj_sql.append(f"CAST({n} AS VARCHAR) AS {n}s_{name.lower()}")
            out_cols.append((f"{n}s_{name.lower()}", "str"))
        elif rng.random() < 0.4:
            proj_aql.append(f"{n} AS {n}_{name.lower()}")
            proj_sql.append(f"{n} AS {n}_{name.lower()}")
            out_cols.append((f"{n}_{name.lower()}", k))
        else:
            proj_aql.append(n)
            proj_sql.append(n)
            out_cols.append((n, k))
    aql = (
        f"TRANSFORM '{name}' FROM BLOCK {prev} (\n"
        f"    APPLY {', '.join(proj_aql)}\n)"
    )
    sql = f"SELECT {', '.join(proj_sql)} FROM {prev.lower()}"
    return aql, sql, out_cols


def gen_sqlfilter(rng: random.Random, prev: str, name: str, cols):
    numeric = [n for n, k in cols if k in ("int", "float")]
    strs = [n for n, k in cols if k == "str"]

    def pred():
        if numeric and (not strs or rng.random() < 0.7):
            c = rng.choice(numeric)
            op = rng.choice([">=", "<=", "=", "<>", ">"])
            return f"{c} {op} {_quarter(rng)}"
        c = rng.choice(strs)
        if rng.random() < 0.3:
            return f"{c} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
        return f"{c} {'=' if rng.random() < 0.6 else '<>'} '{rng.choice(VOCAB)}'"

    p = pred()
    if rng.random() < 0.3:
        p = f"({p}) {'AND' if rng.random() < 0.5 else 'OR'} ({pred()})"
    keep = [n for n, _ in cols if rng.random() < 0.85] or [cols[0][0]]
    sql_body = f"SELECT {', '.join(keep)} FROM {prev.lower()} WHERE {p}"
    aql = f"QUERY '{name}' FROM BLOCK {prev} (\n    {sql_body}\n)"
    out_cols = [(n, dict(cols)[n]) for n in keep]
    return aql, sql_body, out_cols


STAGE_GENS = [gen_agg, gen_lookup, gen_apply, gen_sqlfilter]


def gen_pipeline(seed: int):
    rng = random.Random(seed)
    src_rows = gen_src_rows(rng)
    lkp_rows = gen_lkp_rows(rng)
    blocks = [
        f"DATA 'Src' (\n    {json.dumps(src_rows)}\n)"
        f" WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'k,k2,v,s');",
        f"DATA 'Lkp' (\n    {json.dumps(lkp_rows)}\n)"
        f" WITH (FORMAT = 'JSON_ARRAY', COLUMNS = 'k,k2,lv,ls');",
    ]
    ctes = [
        f"src AS ({duck_table_sql(src_rows, SRC_COLS)})",
        f"lkp AS ({duck_table_sql(lkp_rows, LKP_COLS)})",
    ]
    cols = list(SRC_COLS)
    prev = "Src"
    n_stages = rng.randint(1, 3)
    made = 0
    attempts = 0
    while made < n_stages and attempts < 12:
        attempts += 1
        gen = rng.choice(STAGE_GENS)
        name = f"T{made + 1}"
        out = gen(rng, prev, name, cols)
        if out is None:
            continue
        aql, sql, cols = out
        if not cols:
            continue
        blocks.append(aql)
        ctes.append(f"{name.lower()} AS ({sql})")
        prev = name
        made += 1
    script = "\n".join(blocks)
    duck_sql = "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM {prev.lower()}"
    return script, duck_sql, prev.lower()


# ---------------------------------------------------------------- compare


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 9)
        return int(r) if r == int(r) and abs(r) < 1e15 else r
    return v


def _normalize(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i].lower())
    names = tuple(colnames[i].lower() for i in order)
    data = sorted(
        tuple(repr(_norm(r[i])) for i in order) for r in rows
    )
    return names, data


@pytest.mark.parametrize("seed", range(240))
def test_aql_differential(spark, seed):
    script, duck_sql, final = gen_pipeline(seed)
    res = execute_script(spark, script)
    df = res.frames[final]
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    try:
        cur = con.execute(duck_sql)
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
    finally:
        con.close()
    got = _normalize(spark_cols, spark_rows)
    want = _normalize(duck_cols, duck_rows)
    assert got == want, (
        f"seed={seed}\n--- AQL ---\n{script}\n--- oracle ---\n{duck_sql}\n"
        f"--- spark ---\n{got}\n--- duckdb ---\n{want}"
    )
