"""Custom relational operators Spark lacks as built-ins, composed from
DataFrame primitives (SURVEY guidance: composition first, pandas-UDF only
when semantics demand it).

- :func:`asof_join` — backward as-of join (each left row matched to the
  latest right row with ``right.on <= left.on`` per key). Implemented as
  union + window ``last(ignorenulls)`` — ONE shuffle on the key, a linear
  scan within partitions, no range-explosion. The naive alternative
  (equi-join + filter + row_number) shuffles the full cross-product of
  key-matched rows; this formulation is O(n log n) per key and is the
  scalable shape for 100 TB event streams.
- :func:`interval_join` — equi-key join with a bounded time-range predicate
  (Catalyst evaluates the range as a post-join filter on the equi-join, so
  the shuffle stays keyed, never cross).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """Backward as-of join.

    For every row of ``left``, attach the payload of the most recent
    ``right`` row with the same ``by`` key(s) and ``right[on] <= left[on]``
    (ties at equal ``on`` match). ``tolerance`` (a Column interval or
    literal, e.g. ``F.expr("INTERVAL 1 HOUR")``) nulls matches older than
    ``left[on] - tolerance``.

    Determinism: if several right rows share the same (by, on), the one
    sorting last on the remaining right columns wins — pre-deduplicate the
    right side for fully specified semantics.
    """
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]

    out_names = {c: (c + suffix if c in left.columns else c) for c in [on, *right_cols]}

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in [on, *right_cols]],
    )
    rhs = right.select(
        *[F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.lit(0).alias("_is_left"),
        F.col(on).alias(f"_r_{on}"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # right rows carry the ordering timestamp in left's `on` slot too, so a
    # single window ordered by (on, _is_left) interleaves both sides;
    # _is_left=0 sorts right rows before left rows at equal timestamps.
    rhs = rhs.withColumn(on, F.col(f"_r_{on}"))

    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in [on, *right_cols]:
        unioned = unioned.withColumn(f"_m_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))

    out = unioned.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        in_range = F.col(f"_m_{on}") >= (F.col(on) - tolerance)
        for c in [on, *right_cols]:
            out = out.withColumn(f"_m_{c}", F.when(in_range, F.col(f"_m_{c}")))
    out = out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m_{c}").alias(out_names[c]) for c in [on, *right_cols]],
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a random
    salt in [0, n_salts); the (smaller) right side is replicated n_salts
    times; the join key becomes (on, salt), splitting each hot key across
    ``n_salts`` reducers.

    AQE's skew-join handling covers most cases automatically — use this when
    a single key is so hot that even split shuffle blocks overwhelm one
    executor, or when AQE is unavailable. Replication multiplies the right
    side: keep it for dimension-sized right inputs.

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated ``n_salts`` times, so right/full outer joins would emit up to
    ``n_salts`` null-extended rows per unmatched right row.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'), got {how!r}: "
            "right-side replication would duplicate unmatched right rows"
        )
    salted_l = left.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_r = right.select("*", salts)
    out = salted_l.join(salted_r, [on, "_salt"], how)
    return out.drop("_salt")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str,
    right_ts: str,
    lower=None,
    upper=None,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join with ``left_ts + lower <= right_ts <= left_ts + upper``.

    The equi-key keeps the shuffle hash-partitioned; the range predicate is
    evaluated join-side. For key-skewed data enable AQE skew handling.
    """
    by = [by] if isinstance(by, str) else list(by)
    cond = None
    for k in by:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    if lower is not None:
        cond = cond & (right[right_ts] >= left[left_ts] + lower)
    if upper is not None:
        cond = cond & (right[right_ts] <= left[left_ts] + upper)
    return left.join(right, cond, how)


def hypertable_rollup(
    events: DataFrame,
    ts_col: str,
    agg_exprs: list,
    granularities: tuple[str, ...] = ("hour", "day"),
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Multi-granularity time rollup in ONE pass: every requested
    granularity's aggregate comes out of a single grouping-sets scan
    (one shuffle), instead of one groupBy per granularity.

    Output: (granularity, bucket_start, *extra_keys, *aggregates) — the
    continuous-aggregate/hypertable-rollup shape of timeseries stores,
    expressed so Catalyst's partial aggregation computes the finest level
    map-side and the Expand operator fans it into all levels before one
    exchange. At 100 TB this halves (or better) the scan count vs
    per-granularity jobs.
    """
    from pyspark.sql import functions as F

    keys = list(extra_keys or [])
    truncs = [
        F.date_trunc(g, F.col(ts_col)).alias(f"_b_{g}") for g in granularities
    ]
    base = events.select(*keys, *truncs, *[c for c in events.columns if c not in keys])
    # native DataFrame grouping sets (Spark 4) — no temp view, so concurrent
    # callers can't race on a shared name and nothing leaks into the catalog
    grouped = base.groupingSets(
        [[f"_b_{g}", *keys] for g in granularities],
        *[F.col(f"_b_{g}") for g in granularities],
        *[F.col(k) for k in keys],
    )
    # GROUPING() (legal only inside the aggregate list) identifies the
    # active set even when the data's timestamp is NULL — a null-check on
    # the bucket column would misclassify those rows
    aggs = [F.grouping(f"_b_{g}").alias(f"_g_{g}") for g in granularities]
    aggs += [F.expr(e) for e in agg_exprs]
    out = grouped.agg(*aggs)
    gran = None
    for g in granularities:
        cond = F.col(f"_g_{g}") == 0
        gran = F.when(cond, F.lit(g)) if gran is None else gran.when(cond, F.lit(g))
    helper = {f"_b_{g}" for g in granularities} | {f"_g_{g}" for g in granularities}
    agg_names = [c for c in out.columns if c not in helper and c not in keys]
    return out.select(
        gran.alias("granularity"),
        F.coalesce(*[F.col(f"_b_{g}") for g in granularities]).alias("bucket_start"),
        *keys,
        *agg_names,
    )
