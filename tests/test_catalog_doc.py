"""CATALOG.md freshness pin (VERDICT r12 #8): the committed operator
index must be byte-identical to what tools/gen_catalog.py derives from
the CURRENT registry — adding, renaming, or re-gating an entry without
regenerating the doc fails here, and so does hand-editing the doc."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_catalog_md_matches_registry():
    from tools.gen_catalog import render

    with open(os.path.join(REPO, "CATALOG.md"), encoding="utf-8") as fh:
        committed = fh.read()
    assert committed == render(), (
        "CATALOG.md is stale — run `python tools/gen_catalog.py`"
    )


def test_every_registry_entry_is_documented():
    from analyst_spark.plans.catalog import QUERIES

    with open(os.path.join(REPO, "CATALOG.md"), encoding="utf-8") as fh:
        committed = fh.read()
    missing = [n for n in QUERIES if f"| `{n}` |" not in committed]
    assert not missing, missing
