import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyst_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("analyst_spark_tests", cpus="8")
    # Test corpora are KB-sized: 4 shuffle partitions instead of 8
    # halves the per-exchange task count, which is pure scheduler
    # latency at this scale (VERDICT r14 #6 — the suite must fit the
    # driver's verify window). Runtime-settable conf; values are
    # partitioning-independent by the determinism contract, and the
    # explicit-partitioning assertions (JDBC, paged datasource) set
    # their own counts.
    s.conf.set("spark.sql.shuffle.partitions", "4")
    return s


SF_DIR = "/root/testdata/sf0.001"


# Shared near-dup text fixture (r12 review: it had been copy-pasted
# between the incremental-lifecycle and advice suites): 36 distinct
# tokens, long enough that dropping the first token leaves a heavily
# overlapping shingle set.
NEARDUP_LONG_A = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))


def drop_first_token(text: str) -> str:
    return text.split(" ", 1)[1]
