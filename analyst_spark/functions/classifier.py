"""Hashed-feature quality classifier — the CCNet/GPT-3-style linear
quality filter trained and applied entirely in Catalyst.

LLM curation pipelines score documents with a cheap linear classifier
over hashed bag-of-token features (fastText-class: CCNet's wikipedia
filter, GPT-3's WebText filter) and keep/resample by score. This
module gives that operator a Spark-first shape:

* features — one explode + hash-groupBy: (doc, bucket, x) with
  md5-derived buckets (reproducible in any engine) and per-document
  L1 normalization; the feature table is persisted once and reused
  by every training step.
* training — full-batch logistic regression by gradient descent
  where EACH STEP IS TWO CATALYST AGGREGATIONS: margins = one
  broadcast-join of the (n_buckets)-row weight table + groupBy(doc);
  gradient = one join-back + groupBy(bucket). The only driver
  round-trip per step is the n_buckets-sized gradient — the same
  "ship the dim-bounded invariant, never the data" shape as
  kmeans_train and pca_train. No Python touches a row.
* scoring — the margin aggregation once more, with the final weights.

At 100 TB: the feature table is (tokens)-sized but hash-compressed to
longs, each step shuffles it by doc then by bucket (both keys grow
with data — no hot key), and the weight table is KB-sized forever.
Iterative => no SQL oracle; the pytest twin (tests/test_classifier.py)
re-runs the exact recipe in numpy and pins weights to ~1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1024


def hashed_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(id, bucket, x): md5-hashed token buckets with per-document L1
    normalization (x = token_count / total_tokens). md5 keeps the
    bucketing reproducible outside the JVM (hash() would not be)."""
    from analyst_spark.tables import spread

    tok = spread(docs, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    counts = (
        tok.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    totals = counts.groupBy(id_col).agg(F.sum("cnt").alias("total"))
    return counts.join(totals, id_col).select(
        F.col(id_col),
        "bucket",
        (F.col("cnt") / F.col("total")).alias("x"),
    )


DENSE_QUALITY_COLS = ("f_logtok", "f_meanlen", "f_ttr")


def dense_quality_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """THREE dense per-document quality features as COLUMNS (the
    CCNet-style handful of shape statistics; r11):

    * ``f_logtok``: log1p(token count) / 10
    * ``f_meanlen``: mean token length / 10
    * ``f_ttr``: distinct-token (type/token) ratio

    Deterministic Catalyst expressions, one narrow pass, no explode —
    a doc's whole feature vector lives on its row, which is what lets
    :func:`train_quality_irls` compute exact Newton steps with ONE
    aggregation per iteration. Zero-token documents carry 0s: empty
    tokens are filtered out of the split array (ADVICE r11 — split of
    an empty trimmed string yields [""], which would otherwise count
    as one token and give such docs f_logtok ≈ 0.069, f_ttr = 1.0,
    making the nullif zero guards dead code). The
    motivating measurement: L1-normalized token hashes make document
    LENGTH invisible (Σx = 1 for every doc), yet the Gopher weak
    labels are length/shape-driven, so first-order GD on
    :func:`hashed_features` alone plateaued at the majority class
    (pred_true_rate exactly 1.0 at any lr/steps), while these three
    columns alone reach ~0.78 accuracy under a converged solver.
    """
    from analyst_spark.tables import spread

    ts = F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    return (
        spread(docs, id_col)
        .select(F.col(id_col), ts.alias("__ts"))
        .select(
            id_col,
            F.size("__ts").alias("__n"),
            F.expr("aggregate(__ts, 0L, (a, x) -> a + length(x))").alias(
                "__chars"
            ),
            F.size(F.array_distinct("__ts")).alias("__d"),
        )
        .select(
            id_col,
            (F.log1p(F.col("__n")) / F.lit(10.0)).alias("f_logtok"),
            F.coalesce(
                F.col("__chars")
                / (F.lit(10.0) * F.nullif(F.col("__n"), F.lit(0))),
                F.lit(0.0),
            ).alias("f_meanlen"),
            F.coalesce(
                F.col("__d") / F.nullif(F.col("__n"), F.lit(0)).cast("double"),
                F.lit(0.0),
            ).alias("f_ttr"),
        )
    )


def train_quality_irls(
    stats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    iters: int = 8,
    ridge: float = 1e-6,
) -> tuple[list[float], float]:
    """Logistic regression on the dense quality columns via IRLS
    (Newton-Raphson) — converges in single-digit iterations where
    full-batch first-order GD needed thousands (measured: the GD
    entry oscillated between the all-true and all-false constants at
    every lr/step setting tried).

    Each iteration is ONE distributed aggregation: with x the
    bias-extended feature row, it sums the 10 distinct entries of
    Σ s·x·xᵀ (s = p(1-p), the IRLS weight) and the 4 entries of
    Σ s·x·z (z the working response m + (y-p)/s) — 14 map-side-
    combined scalar sums over doc rows, never a matrix per row — and
    the driver solves the ridge-damped 4×4 normal equations (numpy,
    O(1)). State shipped per round: 14 doubles up, 4 down. At 100 TB
    this is the same shape as one groupBy().agg() pass per iteration.

    Returns (weights[3], bias)."""
    import numpy as np

    f = stats.join(labels, id_col).persist()
    n = f.count()  # materializes the persist
    if n == 0:
        f.unpersist()
        return [0.0, 0.0, 0.0], 0.0
    cols = list(DENSE_QUALITY_COLS)
    beta = np.zeros(4)  # (w1, w2, w3, b)
    for _ in range(iters):
        m = sum(
            F.col(c) * F.lit(float(beta[i])) for i, c in enumerate(cols)
        ) + F.lit(float(beta[3]))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-m))
        s = p * (F.lit(1.0) - p)
        # working response; s is bounded away from 0 by the epsilon
        # so the division is safe at saturated points
        s_safe = F.greatest(s, F.lit(1e-9))
        z = m + (F.col("y") - p) / s_safe
        x = [F.col(c) for c in cols] + [F.lit(1.0)]
        aggs = []
        for i in range(4):
            for j in range(i, 4):
                aggs.append(
                    F.sum(s_safe * x[i] * x[j]).alias(f"a_{i}_{j}")
                )
        for i in range(4):
            aggs.append(F.sum(s_safe * x[i] * z).alias(f"v_{i}"))
        row = f.agg(*aggs).first()
        A = np.zeros((4, 4))
        v = np.zeros(4)
        for i in range(4):
            for j in range(i, 4):
                A[i, j] = A[j, i] = row[f"a_{i}_{j}"]
            v[i] = row[f"v_{i}"]
        beta = np.linalg.solve(A + ridge * np.eye(4), v)
    f.unpersist()
    return [float(b_) for b_ in beta[:3]], float(beta[3])


def score_quality_dense(
    stats: DataFrame, w: list, b: float, id_col: str = "doc_id"
) -> DataFrame:
    """σ(w·x + b) over the dense quality columns — map-only."""
    m = sum(
        F.col(c) * F.lit(float(w[i]))
        for i, c in enumerate(DENSE_QUALITY_COLS)
    ) + F.lit(float(b))
    return stats.select(
        F.col(id_col),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-m))).alias("score"),
    )


def _margins(feats: DataFrame, w_df: DataFrame, bias: float, id_col: str):
    """Σ x·w[bucket] + b per document — one broadcast join + agg."""
    return (
        feats.join(F.broadcast(w_df), "bucket")
        .groupBy(id_col)
        .agg((F.sum(F.col("x") * F.col("w")) + F.lit(bias)).alias("m"))
    )


def train_quality_classifier(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    steps: int = 6,
    lr: float = 4.0,
    l2: float = 1e-4,
) -> tuple[list[float], float]:
    """Full-batch logistic regression: ``labels`` is (id, y∈{0,1}).
    Returns (weights[n_buckets], bias). Every step runs distributed;
    the driver sees only the n_buckets-sized gradient."""
    spark = feats.sparkSession
    f = feats.join(labels, id_col).persist()
    n = f.select(id_col).distinct().count()  # materializes the persist
    w = [0.0] * n_buckets
    b = 0.0
    if n == 0:  # empty corpus -> the zero model, not a 0/0 crash
        f.unpersist()
        return w, b
    for _ in range(steps):
        w_df = spark.createDataFrame(
            list(enumerate(w)), ["bucket", "w"]
        )
        m = _margins(
            f.select(id_col, "bucket", "x"), w_df, b, id_col
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
        # one residual row per DOCUMENT (m is per-doc already); the
        # per-bucket gradient then joins it back onto the features
        doc_r = m.join(labels, id_col).select(
            id_col, (p - F.col("y")).alias("r")
        ).persist()
        gb = doc_r.agg(F.sum("r")).first()[0] / float(n)
        grad_rows = (
            f.select(id_col, "bucket", "x")
            .join(doc_r, id_col)
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("r")) / F.lit(float(n))).alias("g"))
            .collect()
        )
        doc_r.unpersist()
        grad = {r.bucket: r.g for r in grad_rows}
        w = [
            wi - lr * (grad.get(i, 0.0) + l2 * wi)
            for i, wi in enumerate(w)
        ]
        b -= lr * gb
    f.unpersist()
    return w, b


def score_quality(
    feats: DataFrame,
    weights: list[float],
    bias: float,
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """(id, score): σ(w·x + b) per document with the trained model."""
    spark = feats.sparkSession
    w_df = spark.createDataFrame(list(enumerate(weights)), ["bucket", "w"])
    m = _margins(feats, w_df, bias, id_col)
    return m.select(
        F.col(id_col),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), round_digits
        ).alias("score"),
    )


def frozen_quality_margins(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, margin) under the FROZEN model (classifier_frozen.py,
    generated by tools/freeze_classifier.py) — the CCNet deployment
    shape: train offline, score with shipped constants.

    The margin is computed in EXACT integer arithmetic so any engine
    reproduces it bit-for-bit (the funnel hash gate depends on this):
    numer = Σ cnt·Wn over nano-unit integer weights (order-free
    integer sum), margin = numer/(total·1e9) + Bn/1e9 — every operand
    of every float op is exactly representable, so IEEE rounding is
    identical on Spark and the DuckDB oracle."""
    from analyst_spark.tables import spread

    tok = spread(docs, id_col).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(text_col)), r"\s+")).alias("tok"),
    )
    return frozen_quality_margins_from_tokens(tok, id_col)


def frozen_quality_margins_from_tokens(
    tok: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """:func:`frozen_quality_margins` over an already-exploded
    (id, tok) frame — the shared-tokenization form the fused curation
    funnel consumes so the corpus is split exactly once across all
    funnel stages. Same exact-integer margin arithmetic — the float
    margin derives from the single integer-pair definition below."""
    from analyst_spark.functions import classifier_frozen as cf

    return frozen_quality_margin_ints_from_tokens(tok, id_col).select(
        F.col(id_col),
        (
            F.col("numer") / (F.col("total") * F.lit(1e9))
            + F.lit(cf.BIAS_NANO) / F.lit(1e9)
        ).alias("margin"),
    )


def frozen_quality_margin_ints_from_tokens(
    tok: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The frozen margin's EXACT INTEGER pair (id, numer, total):
    margin = numer/(total*1e9) + BIAS_NANO/1e9. Consumers that only
    need threshold comparisons (the prune-curve entry) stay in pure
    integer arithmetic — margin >= k/1000 iff
    1000*(numer + BIAS_NANO*total) >= k*total*1e9 — and never touch
    a float at all."""
    from analyst_spark.functions import classifier_frozen as cf

    spark = tok.sparkSession
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        % cf.N_BUCKETS
    )
    cnt = (
        tok.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_df = spark.createDataFrame(
        [(b, w) for b, w in enumerate(cf.WEIGHTS_NANO) if w],
        "bucket long, wn long",
    )
    tot = cnt.groupBy(id_col).agg(F.sum("cnt").alias("total"))
    num = (
        cnt.join(F.broadcast(w_df), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("wn")).alias("numer"))
    )
    return tot.join(num, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("numer"), F.lit(0)).alias("numer"),
        "total",
    )
