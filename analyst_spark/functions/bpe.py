"""Distributed BPE tokenizer training.

The reference has nothing like this; it belongs to the
training-data-pipeline surface (token budgeting needs a tokenizer,
and training one over the actual corpus is the standard first step).

Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY
table, not the corpus: one corpus scan builds (word, count), and
every merge iteration runs over that vocab-sized table — at 100 TB
the corpus may be billions of documents but the distinct-word table
is tens of millions of rows, so the per-iteration cost is independent
of corpus size. Each iteration is:

* pair counting — explode adjacent symbol pairs weighted by word
  count, one map-side-combined groupBy (vocab-sized shuffle);
* argmax — a deterministic top-1 (count desc, then lexicographic
  pair) collected to the driver: one tiny row per iteration, the same
  centroid-sized round-trip kmeans_train makes;
* merge application — a Catalyst ``aggregate`` fold over each symbol
  array replacing leftmost non-overlapping (a, b) with ab; pure
  expression, no Python.

The symbol table is persisted and re-persisted every few iterations
to cut the growing lineage (same pattern as the connected-components
loop in functions/cluster.py).

Determinism contract: integer counts + total lexicographic tie-break
make the merge sequence a pure function of the input corpus, which is
what the tests pin against a pure-Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analyst_spark.tables import spread

_CHECKPOINT_EVERY = 8


def _merge_fold(sym_col: Column, a: str, b: str) -> Column:
    """Replace leftmost non-overlapping adjacent (a, b) with a+b via a
    left-to-right fold: push x; if the last pushed symbol is ``a`` and
    x is ``b``, replace the last with ``ab``. Greedy left-to-right,
    exactly the classic scan (after a merge the new symbol, not
    ``a``, is what the next element compares against)."""
    merged = a + b
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, cnt) over the corpus — the one corpus-sized pass."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return (
        spread(docs)
        .select(F.explode(F.split(F.trim(c), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 16,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right,
    pair_count)] in merge order. Stops early when no pair reaches
    ``min_pair_count``."""
    wf = word_frequencies(docs, text_col)
    syms = wf.select(
        "cnt", F.split("w", "").alias("s")
    ).persist()
    syms.count()  # materialize before the loop
    retained = [syms]
    merges: list[tuple[str, str, int]] = []
    try:
        for it in range(num_merges):
            pairs = syms.select(
                "cnt",
                F.explode(
                    F.when(
                        F.size("s") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("s") - 1),
                            lambda i: F.struct(
                                F.element_at("s", i).alias("a"),
                                F.element_at("s", i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
                .first()
            )
            if best is None or best.n < min_pair_count:
                break
            merges.append((best.a, best.b, int(best.n)))
            syms = syms.select("cnt", _merge_fold(F.col("s"), best.a, best.b).alias("s"))
            if (it + 1) % _CHECKPOINT_EVERY == 0:
                # break the lineage: each fold nests the previous plan
                syms = syms.persist()
                syms.count()
                retained.append(syms)
    finally:
        for df in retained:
            df.unpersist()
    return merges


def bpe_train_model(texts: list[str], num_merges: int = 16,
                    min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Pure-Python reference implementation (same tie-break) the
    distributed trainer is tested against."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                wf[w] += 1
    syms = {w: list(w) for w in wf}
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += wf[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_pair_count:
            break
        merges.append((a, b, n))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def bpe_encode(col: Column | str, merges: list[tuple[str, str, int]] | list[tuple[str, str]]) -> Column:
    """Encode a text column with a learned merge table: per word,
    start from characters and apply every merge in order (chained
    Catalyst folds — no Python in the data path). Returns
    array<string> of tokens for the whole text (words concatenated in
    order).

    Expression depth grows linearly with len(merges); for vocabularies
    beyond a few hundred merges, encode via a pandas UDF instead —
    this form exists for the moderate-merge-count case and for parity
    testing against the trainer."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), r"\s+")

    def encode_word(w: Column) -> Column:
        s = F.split(w, "")
        for m in merges:
            a, b = m[0], m[1]
            s = _merge_fold(s, a, b)
        return s

    return F.flatten(
        F.transform(F.filter(words, lambda w: w != ""), encode_word)
    )


def bpe_encode_model(text: str, merges) -> list[str]:
    """Pure-Python twin of :func:`bpe_encode`."""
    out: list[str] = []
    for w in text.lower().strip().split():
        if not w:
            continue
        s = list(w)
        for m in merges:
            a, b = m[0], m[1]
            ns: list[str] = []
            for x in s:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = a + b
                else:
                    ns.append(x)
            s = ns
        out.extend(s)
    return out
