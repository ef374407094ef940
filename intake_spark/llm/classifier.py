"""Distributed hashed-feature linear classifier for data selection.

The classifier-based alternative to DSIR importance weights
(``text.dsir_weights``): train a linear model on hashed unigram+bigram
counts to separate a target slice from the rest, then score every
document — the "quality classifier" step of GPT-3/LLaMA-style curation
pipelines, re-expressed Spark-first.

Design constraints, in order:

1. **Engine-exact.** Training is full-batch gradient descent on the
   LEAST-SQUARES objective with ±1 labels, all arithmetic in BIGINT
   fixed point (weights scaled by ``scale``), the learning-rate division
   as truncating integer division — zero floats, zero transcendentals,
   so a DuckDB oracle can replay training round for round and match the
   final scores bit for bit (the q72 unrolled-CTE pattern).
2. **Distributed shape.** The feature matrix is the (doc, bucket, count)
   long form — one explode + one hash-aggregation. Each GD round is:
   scores = features ⋈ BROADCAST(weights) → doc-sum; errors = one
   doc-key join; gradient = features ⋈ errors → bucket-sum (a
   ``buckets``-sized shuffle with map-side combine). Weights live in a
   ``buckets+1``-row table, localCheckpoint-ed per round so the plan
   stays flat (same discipline as the PageRank iterations). Nothing
   driver-sized but the weight table itself.

Overflow audit (int64): with ``scale`` = 1e4, per-doc counts x ≤ 1e3 and
errors |e| ≤ ~1e6 fx, the bucket gradient is Σ_docs x·e ≤ n_docs·1e9 —
safe through ~1e9 documents; per-shard corpora beyond that should raise
``eta_inv`` (shrinking e) or train on a hash-sampled subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_bucket_counts(
    df: DataFrame, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(id, b, x) long-form hashed unigram+bigram counts plus a constant
    bias feature at bucket ``buckets`` — the same md5 bucketing as
    ``text.dsir_weights`` so the two selectors see identical features."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    w = F.filter(F.split(txt, " "), lambda x: F.length(x) > 0)
    base = df.select(F.col(id_col), w.alias("_w"))
    grams = F.concat(
        F.col("_w"),
        F.expr(
            "CASE WHEN size(_w) >= 2 THEN transform(sequence(1, size(_w) - 1), "
            "i -> concat_ws(' ', slice(_w, i, 2))) ELSE array() END"
        ),
    )
    ex = base.select(F.col(id_col), F.explode(grams).alias("g")).withColumn(
        "b",
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("bigint") % buckets,
    )
    counts = ex.groupBy(id_col, "b").agg(F.count(F.lit(1)).alias("x"))
    bias = df.select(
        F.col(id_col),
        F.lit(buckets).cast("bigint").alias("b"),
        F.lit(1).cast("bigint").alias("x"),
    )
    return counts.select(F.col(id_col), F.col("b"), F.col("x").cast("bigint")).unionByName(
        bias
    )


def hashed_linear_classifier(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    scale: int = 10_000,
    eta_inv: int = 256,
    iters: int = 3,
) -> DataFrame:
    """Train the least-squares linear classifier ``w`` on hashed n-gram
    counts against ``label`` (a boolean Column → y ∈ {+1, −1}) and score
    every document: returns (id, y, n_feats, score_fx, pred) where
    ``score_fx`` is the final x·w dot product in ``1/scale`` fixed point
    and ``pred`` is its sign.

    Update rule, per full-batch round (all BIGINT):

        p_d   = Σ_b x_db · w_b            (doc score, fx)
        e_d   = p_d − scale · y_d          (residual, fx)
        g_b   = Σ_d x_db · e_d             (gradient, fx)
        w_b  −= trunc_div(g_b, eta_inv·n)  (step η = 1/eta_inv, mean grad)

    ``eta_inv`` must exceed the feature matrix's spectral bound for
    convergence (default 256 is stable for ~150-gram documents hashed
    into 64 buckets); the classifier is the standard data-selection
    scorer regardless of convergence fine-tuning."""
    if iters < 1 or buckets < 1:
        raise ValueError("iters and buckets must be >= 1")
    spark = df.sparkSession
    # Materialize the long-form feature matrix once (n·(buckets+1) rows,
    # lineage truncated) — every GD round and the final scoring pass read
    # it instead of re-exploding the corpus. localCheckpoint rather than
    # persist: checkpointed blocks are reclaimed when the frame goes out
    # of scope, so repeated training runs in one session don't pin cache.
    x = _gram_bucket_counts(df, id_col, text_col, buckets).localCheckpoint(eager=True)
    y = df.select(
        F.col(id_col),
        F.when(label, F.lit(1)).otherwise(F.lit(-1)).cast("int").alias("y"),
    )
    n = y.count()  # one scalar: the denominator of the mean gradient
    if n == 0:
        # an empty corpus would make every update a division by zero
        # (an ANSI-mode error, silent NULL weights otherwise)
        raise ValueError("hashed_linear_classifier needs at least one document")
    d = eta_inv * n
    w = spark.createDataFrame(
        [(b, 0) for b in range(buckets + 1)], "b long, w long"
    )
    for _ in range(iters):
        p = (
            x.join(F.broadcast(w), "b")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.col("w")).alias("p"))
        )
        e = y.join(p, id_col, "left").select(
            F.col(id_col),
            (F.coalesce(F.col("p"), F.lit(0)) - F.lit(scale) * F.col("y")).alias("e"),
        )
        g = (
            x.join(e, id_col)
            .groupBy("b")
            .agg(F.sum(F.col("x") * F.col("e")).alias("g"))
        )
        w = (
            w.join(g, "b", "left")
            .select(
                F.col("b"),
                (
                    F.col("w")
                    - F.coalesce(F.expr(f"g div {d}"), F.lit(0))
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    scores = (
        x.join(F.broadcast(w), "b")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("x") * F.col("w")).alias("score_fx"),
            F.sum("x").alias("n_feats"),
        )
    )
    out = y.join(scores, id_col, "left").select(
        F.col(id_col),
        F.col("y"),
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("score_fx"), F.lit(0)).cast("long").alias("score_fx"),
        F.when(F.coalesce(F.col("score_fx"), F.lit(0)) > 0, F.lit(1))
        .when(F.coalesce(F.col("score_fx"), F.lit(0)) < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("pred"),
    )
    return out
