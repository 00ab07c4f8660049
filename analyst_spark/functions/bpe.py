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

Batched training (``batch > 1``): classic BPE is one driver
round-trip *per merge*, so a production 32k-merge train is 32k
sequential Spark jobs — scheduler overhead dominates at any data
size. The standard fix (used by every fast BPE trainer) is to select
the top-M mutually NON-INTERACTING pairs per iteration and apply them
in one pass. Two pairs interact when they share a symbol, when one
pair's merged output is a symbol of the other, or when both produce
the same output — interacting merges' counts go stale mid-batch and
single-pass application would diverge from sequential application.
With the interaction rule enforced, the batch counts measured at
iteration start stay exact (merging (a,b)→ab never creates or
destroys an adjacency of a disjoint pair (c,d)), so applying the M
merges in one left-to-right scan with a lookup map is EXACTLY
equivalent to applying them one-at-a-time, and job count drops to
O(num_merges / M). Selection considers the top ``8*batch + 32``
candidates by (count desc, pair asc) — a bounded driver round-trip;
the truncation is part of the algorithm spec so the pure-Python twin
applies the identical rule.

Determinism contract: integer counts + total lexicographic tie-break
make the merge sequence a pure function of the input corpus (and of
``batch``), which is what the tests pin against a pure-Python
reference implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analyst_spark.tables import spread

_CHECKPOINT_EVERY = 8


MAX_BPE_WORD_CHARS = 512


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


def _merge_fold_multi(sym_col: Column, table: dict[tuple[str, str], str]) -> Column:
    """One left-to-right scan applying a whole batch of non-interacting
    merges via a literal struct-keyed map: push x; if (last, x) is in
    the table, replace last with the merged symbol. Because batch
    selection guarantees the pairs are disjoint and no output feeds
    another pair, this single pass equals applying each merge
    sequentially."""
    entries: list[Column] = []
    for (a, b), o in table.items():
        entries.append(F.struct(F.lit(a).alias("l"), F.lit(b).alias("r")))
        entries.append(F.lit(o))
    m = F.create_map(*entries)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & F.element_at(
                m, F.struct(F.element_at(acc, -1).alias("l"), x.alias("r"))
            ).isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.element_at(
                        m, F.struct(F.element_at(acc, -1).alias("l"), x.alias("r"))
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _select_batch(
    cands: list[tuple[str, str, int]], batch: int, min_pair_count: int
) -> list[tuple[str, str, int]]:
    """Greedy non-interacting selection over candidates already sorted
    by (count desc, a asc, b asc). A candidate (a, b) is rejected when
    a, b, or a+b collides with any symbol or output of an
    already-accepted merge. Shared between the distributed trainer and
    the pure-Python twin so both select identically."""
    chosen: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for a, b, n in cands:
        if n < min_pair_count or len(chosen) >= batch:
            break
        o = a + b
        if a in used or b in used or o in used:
            continue
        chosen.append((a, b, n))
        used.update((a, b, o))
    return chosen


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
    batch: int = 1,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right,
    pair_count)] in merge order. Stops early when no pair reaches
    ``min_pair_count``. ``batch`` > 1 selects up to that many
    non-interacting merges per Spark iteration (see module docstring);
    ``batch=1`` is classic sequential BPE. ``stats`` (if given)
    receives {"iterations": N} — the measured Spark-iteration count
    the O(merges/M) cost model predicts (tools/bpe_probe.py)."""
    wf = word_frequencies(docs, text_col)
    # Overlong words are EXCLUDED from training: the per-word fold's
    # immutable-array accumulator copies the accumulator per symbol
    # (O(len²) per word — one 100k-char token hung an executor for
    # minutes, r7 pathological-text sweep), and such runs are noise,
    # not vocabulary. Same cap as the encoder (production tokenizers'
    # max_input_chars_per_word discipline); the python twin
    # bpe_train_model applies the identical rule.
    wf = wf.filter(F.length("w") <= MAX_BPE_WORD_CHARS)
    syms = wf.select(
        "cnt", F.split("w", "").alias("s")
    ).persist()
    syms.count()  # materialize before the loop
    retained = [syms]
    merges: list[tuple[str, str, int]] = []
    it = 0
    try:
        while len(merges) < num_merges:
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
            want = min(batch, num_merges - len(merges))
            k = 8 * want + 32  # candidate horizon; part of the algorithm spec
            top = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(k)
                .collect()
            )
            selected = _select_batch(
                [(r.a, r.b, int(r.n)) for r in top], want, min_pair_count
            )
            if not selected:
                break
            merges.extend(selected)
            if len(selected) == 1:
                a, b, _ = selected[0]
                syms = syms.select("cnt", _merge_fold(F.col("s"), a, b).alias("s"))
            else:
                table = {(a, b): a + b for a, b, _ in selected}
                syms = syms.select(
                    "cnt", _merge_fold_multi(F.col("s"), table).alias("s")
                )
            it += 1
            if it % _CHECKPOINT_EVERY == 0:
                # break the lineage: each fold nests the previous plan
                syms = syms.persist()
                syms.count()
                retained.append(syms)
    finally:
        for df in retained:
            df.unpersist()
    if stats is not None:
        stats["iterations"] = it
    return merges


def bpe_train_model(texts: list[str], num_merges: int = 16,
                    min_pair_count: int = 2,
                    batch: int = 1) -> list[tuple[str, str, int]]:
    """Pure-Python reference implementation (same tie-break, same
    candidate horizon and batch-selection rule) the distributed
    trainer is tested against."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w and len(w) <= MAX_BPE_WORD_CHARS:
                wf[w] += 1
    syms = {w: list(w) for w in wf}
    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        counts: Counter = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += wf[w]
        if not counts:
            break
        want = min(batch, num_merges - len(merges))
        k = 8 * want + 32  # same candidate horizon as the distributed trainer
        cands = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        selected = _select_batch(
            [(a, b, n) for (a, b), n in cands], want, min_pair_count
        )
        if not selected:
            break
        merges.extend(selected)
        table = {(a, b): a + b for a, b, _ in selected}
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and (out[-1], x) in table:
                    out[-1] = table[(out[-1], x)]
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
        folded = s
        for m in merges:
            a, b = m[0], m[1]
            folded = _merge_fold(folded, a, b)
        # overlong words skip the folds (O(len²) accumulator copies;
        # same cap as the trainer and the pandas encoder)
        return F.when(F.length(w) <= MAX_BPE_WORD_CHARS, folded).otherwise(s)

    return F.flatten(
        F.transform(F.filter(words, lambda w: w != ""), encode_word)
    )


def bpe_encode_model(text: str, merges) -> list[str]:
    """Pure-Python twin of :func:`bpe_encode`."""
    out: list[str] = []
    for w in text.lower().strip().split():
        if len(w) > MAX_BPE_WORD_CHARS:
            out.extend(list(w))
            continue
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


def bpe_encode_pandas(
    col: Column | str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
) -> Column:
    """Arrow-batched encoder for large merge tables.

    ``bpe_encode`` chains one Catalyst fold per merge — expression
    depth grows linearly, so past a few hundred merges codegen chokes.
    This variant ships the merge table once per executor (closure
    capture ~ a broadcast of the ranked merge list; 32k merges is a
    sub-MB dict) and encodes each Arrow batch in pandas with the
    standard rank-priority BPE loop. Python, but vectorized transfer
    and O(word_len * merges_applied) per word with a dict lookup —
    the same hot loop every production tokenizer runs.

    Parity: identical output to bpe_encode/bpe_encode_model for any
    WELL-FORMED merge table (one where a merge's symbols always exist
    before its rank — true of every table bpe_train produces, batched
    or not): applying a merge only creates adjacencies involving its
    output, whose pairs rank strictly later, so the rank-priority
    rescan visits merges in exactly the sequential order. Pinned in
    tests/test_bpe.py.

    Words longer than ``MAX_BPE_WORD_CHARS`` bypass the merge loop and
    emit as raw character symbols: the rescan applies up to L merges
    per word, each with an O(L) scan — O(L²) on a single 100k-char
    base64-ish token hung an executor for minutes (r7 pathological-
    text sweep). Production tokenizers impose the same cap (e.g.
    HuggingFace ``max_input_chars_per_word``); real corpora DO carry
    such runs, so the cap is the deployment behavior, not a shortcut.
    """
    from pyspark.sql.functions import pandas_udf

    rank = {(m[0], m[1]): i for i, m in enumerate(merges)}
    table = {(m[0], m[1]): m[0] + m[1] for m in merges}

    def encode_word(w: str) -> list[str]:
        if len(w) > MAX_BPE_WORD_CHARS:
            return list(w)
        s = list(w)
        while len(s) >= 2:
            best_i, best_r = -1, len(rank)
            # lowest-rank pair, leftmost on ties — then rescan: this
            # matches applying each merge exhaustively in rank order
            for i in range(len(s) - 1):
                r = rank.get((s[i], s[i + 1]), len(rank))
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= len(rank):
                break
            a, b = s[best_i], s[best_i + 1]
            # apply THIS merge greedily left-to-right across the word
            # (identical to one _merge_fold pass), then continue with
            # the next-lowest surviving rank
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = table[(a, b)]
                else:
                    out.append(x)
            s = out
        return s

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().strip().split():
                if w:
                    toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return enc(c)
