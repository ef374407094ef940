"""Deterministic distinct-count sketching: KMV (k-minimum-values).

``approx_count_distinct`` (HyperLogLog++) is engine-specific — its
estimate differs between Spark and any oracle, so it can't be
value-verified. KMV gives the same accuracy class (relative error
~ 1/sqrt(k)) from a *deterministic* definition: hash every value with md5,
keep the k smallest hashes per group, and estimate

    distinct ≈ (k - 1) / (kth_smallest_hash / 2^32)

Because the k-minimum set is a pure function of the value set, the sketch
is (a) identical across engines — DuckDB re-derives it exactly, so the
estimate itself is hash-checkable — and (b) mergeable: union the hash
sets and re-take the k minimum (the classic distributed-sketch property;
Spark's partial aggregation does exactly this with the window formulation
below collapsing to one shuffle on the group key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = float(2**32)


def _bt(name: str) -> str:
    """Backtick-quote a column name for splicing into a SQL expression.
    Quoting forces TOP-LEVEL resolution — a bare ``F.col("a.b")`` would
    instead try struct-field resolution on a dotted name — so every
    column reference in this module goes through :func:`_c` /  ``_bt``
    to keep plain, spaced, and dotted names working alike."""
    return "`" + name.replace("`", "``") + "`"


def _c(name: str):
    """Top-level column reference that survives exotic names (spaces,
    dots, backticks) — the DataFrame-side twin of :func:`_bt`."""
    return F.col(_bt(name))


def hll_alpha(m: int) -> float:
    """HLL bias-correction constant: the paper's fixed values below
    m=128, the asymptotic formula above."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _h32(col):
    """32-bit md5-derived hash, identical in any engine with md5."""
    return F.conv(F.substring(F.md5(_c(col).cast("string")), 1, 8), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col`` via a KMV
    sketch → (group..., est_distinct, n_hashes).

    Plan: distinct (group, hash) pairs (map-side combine on the 8-byte
    hash), then rank hashes per group and keep the k-th minimum — one
    shuffle on the group key. Groups with fewer than k distinct values are
    *exact* (the estimate is the observed distinct count).
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    # NULL values drop before hashing: md5(NULL) is NULL, which Spark's
    # ascending sort ranks FIRST but DuckDB ranks LAST — it would both bias
    # the estimate and break oracle equality
    hashed = (
        df.filter(_c(value_col).isNotNull())
        .select(*[_c(g) for g in group_cols], _h32(value_col).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*[_c(g) for g in group_cols]).orderBy(F.asc("_h"))
    ranked = hashed.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    agg = ranked.groupBy(*[_c(g) for g in group_cols]).agg(
        F.max("_r").cast("long").alias("n_hashes"), F.max("_h").alias("_kth")
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise((F.lit(float(k - 1))) / (F.col("_kth").cast("double") / F.lit(_HASH_SPACE)))
    return agg.select(*[_c(g) for g in group_cols], est.alias("est_distinct"), "n_hashes")


def kmv_distinct_sql(table: str, group_cols: list[str], value_col: str, k: int = 64) -> str:
    """The DuckDB oracle for :func:`kmv_distinct` — same hash, same ranks,
    same estimator, expressed in SQL."""
    g = ", ".join(group_cols)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {g},
             CAST(concat('0x', substr(md5(CAST({value_col} AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      FROM {table} WHERE {value_col} IS NOT NULL),
    ranked AS (
      SELECT {g}, h, ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS r
      FROM hashed),
    agg AS (
      SELECT {g}, MAX(r) AS n_hashes, MAX(h) AS kth
      FROM ranked WHERE r <= {k} GROUP BY {g})
    SELECT {g},
           CASE WHEN n_hashes < {k} THEN CAST(n_hashes AS DOUBLE)
                ELSE {float(k - 1)} / (CAST(kth AS DOUBLE) / {_HASH_SPACE}) END AS est_distinct,
           n_hashes
    FROM agg
    """


def column_profile(
    df: DataFrame,
    group_cols: list[str] | str,
    num_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-group numeric profile: count, nulls, distinct, min/max and exact
    quantiles — the dataset-quality report card a corpus build runs before
    training (spot truncated sources, length outliers, empty shards).

    One hash-aggregate on the group key; ``percentile`` is Spark's *exact*
    sort-based quantile (linear interpolation at rank p*(n-1), the same
    definition as DuckDB's ``quantile_cont``, so results are
    value-identical across engines — unlike approx_percentile). Exact
    quantiles buffer each group's values on one reducer: fine for profile
    groups (a corpus has thousands of sources, not billions); switch to a
    mergeable KLL sketch if a single group outgrows executor memory.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    qlist = ", ".join(f"{q}D" for q in quantiles)
    qcols = [
        F.expr(f"percentile({_bt(num_col)}, array({qlist}))")[i].alias(f"p{int(q * 100)}")
        for i, q in enumerate(quantiles)
    ]
    return df.groupBy(*[_c(g) for g in group_cols]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_c(num_col).isNull().cast("bigint")).alias("n_null"),
        F.countDistinct(_c(num_col)).alias("n_distinct"),
        F.min(_c(num_col)).alias("min_v"),
        F.max(_c(num_col)).alias("max_v"),
        *qcols,
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate from a DETERMINISTIC
    md5-derived register definition → (group..., n_buckets_hit,
    hll_est_r). The engine-agnostic cousin of
    ``approx_count_distinct`` (whose HLL++ registers are engine
    implementation details): bucket = first 32 hash bits mod m = 2^p,
    rho = leading-zero count of the next 60 bits + 1 (capped at 44, far
    past any collision), register = max rho per bucket. The register
    table is a pure function of the VALUE SET — mergeable by max, which
    is exactly what Spark's partial aggregation does map-side — and
    DuckDB re-derives it bit for bit.

    The harmonic sum uses dyadic-integer terms ``1 << (44 - M)`` so it
    is an exact BIGINT (order-independent); only the final
    ``alpha·m²·2^44 / S`` estimate is a double, and it is one identical
    IEEE expression in both engines. Raw HLL (no small/large-range
    corrections — those need ln/linear-counting branches); accuracy
    ~1.04/sqrt(m), intended for distinct counts comfortably above
    2.5·m, the standard correction threshold.

    Scale: one hash-aggregation to (groups × m) rows with map-side
    combine, then a groups-sized rollup — the classic sketch shape for
    counting distincts over 100 TB without a shuffle of the values.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if not 4 <= p <= 14:
        raise ValueError("p must be in [4, 14]")
    m = 1 << p
    alpha = hll_alpha(m)
    h2 = (
        f"cast(conv(substring(md5(cast({_bt(value_col)} as string)), 9, 15), "
        "16, 10) as bigint)"
    )
    rho = (
        f"cast(least(CASE WHEN {h2} = 0 THEN 61 "
        f"ELSE 61 - length(bin({h2})) END, 44) as int)"
    )
    bucketed = df.filter(_c(value_col).isNotNull()).select(
        *[_c(c) for c in group_cols],
        (_h32(value_col) % m).alias("_b"),
        F.expr(rho).alias("_rho"),
    )
    regs = bucketed.groupBy(*[_c(c) for c in group_cols], F.col("_b")).agg(
        F.max("_rho").alias("_m")
    )
    rolled = regs.groupBy(*[_c(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n_buckets_hit"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 44 - _m)")).alias("_s_hit"),
    )
    # empty buckets contribute 2^44 each; S is exact BIGINT either way
    s_total = F.col("_s_hit") + (F.lit(m) - F.col("n_buckets_hit")) * F.lit(1 << 44)
    return rolled.select(
        *[_c(c) for c in group_cols],
        F.col("n_buckets_hit").cast("long").alias("n_buckets_hit"),
        F.round(
            F.lit(alpha * m * m * float(1 << 44)) / s_total.cast("double"), 4
        ).alias("hll_est_r"),
    )


def _cms_cells(value_col: str, depth: int, width: int):
    """The ONE (row, cell) hash definition both cms_sketch and
    cms_estimate use — a shared helper so build and probe cannot
    diverge (a mismatch would silently make min() hit an empty cell and
    break the never-undercount guarantee). Caller must pass the SAME
    depth/width to both sides; the sketch frame itself does not carry
    them."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    return F.expr(
        "transform(sequence(0, %d), i -> named_struct('row', i, 'cell', "
        "cast(conv(substring(md5(concat('cms', i, ':', cast(%s as string))), 1, 8), "
        "16, 10) as bigint) %% %d))" % (depth - 1, _bt(value_col), width)
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: "str | None" = None,
) -> DataFrame:
    """Count-min sketch of a value stream → (row, cell, cnt), the
    depth×width counter matrix as a long-form frame. Hashes are
    md5-derived (row-salted), so the matrix is a pure function of the
    value multiset: mergeable by cell-wise sum — which IS Spark's
    map-side partial aggregation — and re-derivable exactly by any
    engine with md5. One shuffle of depth·n rows collapsing to
    depth·width groups; the classic frequency-sketch shape for streams
    too large to groupBy exactly.

    ``weight_col`` builds the IDENTICAL matrix from a pre-aggregated
    (value, count) frame — cnt sums weights instead of counting rows —
    so a pipeline that already grouped the stream (e.g. for an exact
    top-k next to the sketch) feeds the aggregate in rather than
    re-exploding the raw stream. A NULL (or non-castable) weight
    contributes 0 — NOT 1 like a raw-stream row — so never-undercount
    holds against the weights as given; feed clean counts."""
    cells = _cms_cells(value_col, depth, width)
    w = (
        F.lit(1).cast("long")
        if weight_col is None
        # _c, not F.col: dotted/spaced weight names must resolve
        # top-level like every other column reference in this module.
        # coalesce keeps a NULL weight from silently NULLing a cell
        # whose only contributions are NULL (cms_estimate would read
        # that cell as 0 and undercount)
        else F.coalesce(_c(weight_col).cast("long"), F.lit(0))
    )
    return (
        df.filter(_c(value_col).isNotNull())
        .select(F.explode(cells).alias("_c"), w.alias("_w"))
        .groupBy(
            F.col("_c.row").alias("row"), F.col("_c.cell").alias("cell")
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each item,
    est = min over rows of the counter its row-hash lands in. The
    (depth·width)-row sketch broadcasts; items are DISTINCT-ed (an
    estimate is a property of the item, so duplicate candidate rows
    collapse) and keep all their columns plus ``cms_est``. Estimates
    never undercount (est ≥ true count);
    overcount is bounded by ~2n/width with probability 1 − 2^−depth."""
    items = items.distinct()  # estimates are per distinct item row
    cells = _cms_cells(value_col, depth, width)
    sk = sketch.select(
        F.col("row").alias("_cms_row"),
        F.col("cell").alias("_cms_cell"),
        F.col("cnt").alias("_cms_cnt"),
    )
    probes = items.withColumn("_cms_probe", F.explode(cells)).select(
        *[_c(c) for c in items.columns],
        F.col("_cms_probe.row").alias("_cms_row"),
        F.col("_cms_probe.cell").alias("_cms_cell"),
    )
    joined = probes.join(
        F.broadcast(sk), ["_cms_row", "_cms_cell"], "left"
    ).select(
        *[_c(c) for c in items.columns],
        F.coalesce(F.col("_cms_cnt"), F.lit(0)).alias("_cms_hit"),
    )
    return joined.groupBy(*[_c(c) for c in items.columns]).agg(
        F.min("_cms_hit").cast("long").alias("cms_est")
    )
