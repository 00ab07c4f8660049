"""Per-entry wall clock on the pathological-text corpus (VERDICT r13
#6): the adversarial sweep in tests/test_pathological_text.py asserts
a pass/fail bound; this records HOW LONG each swept entry actually
takes on the 120k-token / 100k-char-token / emoji / RTL corpus, so
SCALE.md carries measured exposure instead of "it passed".

The corpus and entry list are imported from the test module — one
source of truth; a new entry added to the sweep shows up here on the
next run.

Usage: python tools/pathological_walls.py [--json FILE] [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from analyst_spark.functions.dedup import release_cached
from analyst_spark.plans.catalog import QUERIES
from analyst_spark.session import get_spark


def build_corpus(spark) -> str:
    """The EXACT corpus test_pathological_text.py builds (five docs:
    120k tokens, emoji soup, RTL, one 100k-char token, control)."""
    td = tempfile.mkdtemp(prefix="asp_pathwalls_")
    big_doc = " ".join(f"tok{i % 997}" for i in range(120_000))
    emoji = "🎉🚀 " * 300 + "héllo ﬁne combining " * 100
    rtl = "مرحبا بالعالم שלום עולם " * 150
    one_word = "supercalifragilistic" * 5000
    docs = spark.createDataFrame(
        [
            (0, big_doc, "en", "web", len(big_doc)),
            (1, emoji, "en", "web", len(emoji)),
            (2, rtl, "ar", "web", len(rtl)),
            (3, one_word, "en", "web", len(one_word)),
            (4, "normal words here for control purposes", "en", "web", 38),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(os.path.join(td, "documents.parquet"))
    for f in os.listdir("/root/testdata/sf0.001"):
        dst = os.path.join(td, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join("/root/testdata/sf0.001", f), dst)
    return td


def main() -> None:
    from test_pathological_text import ENTRIES, WALL_BOUND_SECS

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = argv or list(ENTRIES)

    spark = get_spark("pathological_walls")
    corpus = build_corpus(spark)
    walls: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = QUERIES[name](spark, corpus)
        df.collect()
        release_cached(df)
        walls[name] = round(time.time() - t0, 2)
        flag = "" if walls[name] < WALL_BOUND_SECS else "  ** OVER BOUND **"
        print(f"{name:40s} {walls[name]:7.2f}s{flag}", flush=True)
    worst = max(walls, key=walls.get)
    print(
        f"\n{len(walls)} entries, worst {worst} at {walls[worst]:.2f}s "
        f"(bound {WALL_BOUND_SECS}s)"
    )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"bound_secs": WALL_BOUND_SECS, "walls": walls},
                f, indent=1, sort_keys=True,
            )
            f.write("\n")
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
