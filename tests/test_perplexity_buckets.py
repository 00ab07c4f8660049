"""docs_perplexity_buckets pins: the portable floor-division device
must equal mathematical floor division in BOTH engines (the whole
cross-engine bucketing contract rests on it), and the tertile rule
must be tie-safe (equal bins never straddle a bucket cut)."""

import duckdb
import pytest

from analyst_spark.plans.catalog import QUERIES

# (numerator, denominator) grid: signs, exact multiples, |a| < d,
# large magnitudes near the micro-log range the entry produces
CASES = [
    (-7, 3), (7, 3), (-6, 3), (6, 3), (-1, 5), (1, 5), (0, 7),
    (-3_409_123_456, 191_000), (3_409_123_456, 191_000),
    (-25_000_000, 1_000), (-24_999_999, 1_000), (-24_000_001, 1_000),
    (-1, 1_000_000), (-999_999, 1_000_000), (-1_000_000, 1_000_000),
]


def _portable_sql(a: str, d: str) -> str:
    # the device used by docs_perplexity_buckets' qbin on both sides:
    # subtract the positive mod, then integer-divide exactly
    return f"({a} - (({a} % {d} + {d}) % {d}))"


def test_floor_division_device_matches_python_in_spark(spark):
    rows = [(a, d) for a, d in CASES]
    df = spark.createDataFrame(rows, "a long, d long")
    got = {
        (r.a, r.d): r.q
        for r in df.selectExpr(
            "a", "d", f"{_portable_sql('a', 'd')} div d AS q"
        ).collect()
    }
    for a, d in CASES:
        assert got[(a, d)] == a // d, (a, d, got[(a, d)], a // d)


def test_floor_division_device_matches_python_in_duckdb():
    for a, d in CASES:
        (q,) = duckdb.sql(
            f"SELECT {_portable_sql(f'CAST({a} AS BIGINT)', f'CAST({d} AS BIGINT)')}"
            f" // CAST({d} AS BIGINT)"
        ).fetchone()
        assert q == a // d, (a, d, q, a // d)


def test_buckets_tie_safe_and_ordered(spark):
    """Within each language: every distinct qbin maps to exactly one
    bucket, and buckets are monotone in qbin (higher qbin = lower
    perplexity = never a worse bucket)."""
    rank = {"head": 0, "middle": 1, "tail": 2}
    rows = QUERIES["docs_perplexity_buckets"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "entry empty at sf0.001"
    seen: dict[tuple, set] = {}
    for r in rows:
        seen.setdefault((r.lang, r.qbin), set()).add(r.bucket)
    for key, buckets in seen.items():
        assert len(buckets) == 1, f"bin straddles buckets: {key}"
    by_lang: dict[str, list] = {}
    for (lang, qbin), buckets in seen.items():
        by_lang.setdefault(lang, []).append((qbin, next(iter(buckets))))
    for lang, pairs in by_lang.items():
        pairs.sort(reverse=True)  # qbin descending = best first
        ranks = [rank[b] for _, b in pairs]
        assert ranks == sorted(ranks), f"buckets not monotone for {lang}"
