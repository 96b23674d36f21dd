"""Temporal joins Spark's DataFrame API lacks: as-of join and range
(interval) join — both named in the task statement's custom-operator
examples; DuckDB/kdb/Pandas have them natively.

Semantics: each fact row matches the dimension row with the LARGEST
``ts <= fact.ts`` for the same key (NULL when none precedes it).

Spark-first layout — the union+window trick, NOT a range self-join:
both sides union into one stream tagged by side, ONE shuffle on
(key, ts-ordered window), and ``last(value, ignorenulls)`` over the
unbounded-preceding frame carries the latest dimension value forward to
every fact row. Cost is a single sort-shuffle of |facts| + |dim| rows;
the naive inequality join is O(|facts| x |dim per key|) and unindexable.

Tie rule (pinned): a dimension row at EXACTLY the fact's ts matches
('at or before'); the dimension side is deduplicated to one row per
(key, ts) keeping the smallest value first — this makes the operator
deterministic and mirrors DuckDB's ASOF JOIN on a unique dim.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F  # noqa: N812

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def asof_join(
    facts: "DataFrame",
    dim: "DataFrame",
    key: str,
    ts: str,
    value_col: str,
    out_col: str = "asof_value",
) -> "DataFrame":
    """facts + ``out_col`` = dim.``value_col`` as of facts.``ts`` per
    ``key`` (NULL when no dimension row precedes the fact)."""
    dim_unique = (
        dim.groupBy(key, ts)
        .agg(F.min(value_col).alias("_dim_value"))
    )
    fact_side = facts.withColumn("_dim_value", F.lit(None).cast(
        dim_unique.schema["_dim_value"].dataType
    )).withColumn("_is_dim", F.lit(0))
    dim_side = dim_unique.withColumn("_is_dim", F.lit(1))
    unioned = fact_side.unionByName(dim_side, allowMissingColumns=True)

    # dim rows sort BEFORE fact rows at equal ts so 'at or before' matches
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        out_col, F.last("_dim_value", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_is_dim") == 0).drop(
        "_is_dim", "_dim_value"
    )


def range_join(
    facts: "DataFrame",
    ranges: "DataFrame",
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 3600,
) -> "DataFrame":
    """Inner join facts to every range with ``start <= ts < end`` on the
    same ``key`` — one output row per (fact, matching range).

    Scale layout: a raw inequality join is a per-key cross product the
    optimizer cannot index. Instead both sides BUCKETIZE time into
    ``bucket_seconds`` cells: ranges explode to the buckets they cover
    (narrow, fan-out = range span / bucket width), facts map to their one
    bucket, the join is a plain equi-join on (key, bucket), and the exact
    interval predicate re-verifies the candidates. Each (fact, range)
    pair meets in exactly the fact's bucket, so no dedup is needed.
    Pick ``bucket_seconds`` near the typical range span: the candidate
    set then stays within a small constant of the true result."""
    f_bucket = F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds)
    r_lo = F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds)
    # end is exclusive: a range ending exactly on a bucket boundary does
    # not cover that bucket
    r_hi = F.floor(
        (F.unix_timestamp(F.col(end)) - F.lit(1)) / bucket_seconds
    )
    exploded = ranges.withColumn(
        "_bucket", F.explode(F.sequence(r_lo, F.greatest(r_hi, r_lo)))
    )
    tagged = facts.withColumn("_bucket", f_bucket)
    joined = tagged.join(exploded, [key, "_bucket"]).filter(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_bucket")


ROLLUP_LEVELS = ("minute", "hour", "day")


def time_rollup_cascade(
    events: "DataFrame",
    ts: str,
    value: str,
    levels: tuple = ROLLUP_LEVELS,
) -> "DataFrame":
    """Hypertable-style continuous-aggregate cascade: the finest level
    aggregates the raw events ONCE; every coarser level re-aggregates the
    level below it (60x/24x fewer rows), never the raw table — the
    TimescaleDB continuous-aggregate layout. Count and sum are cascade-
    safe (re-aggregable); averages derive as sum/count downstream.
    Output: (level, bucket_ts, n_events, total_value) across all levels.
    """
    cur = events.select(
        F.date_trunc(levels[0], F.col(ts)).alias("bucket_ts"),
        F.col(value).alias("_v"),
    ).groupBy("bucket_ts").agg(
        F.count("*").alias("n_events"),
        F.sum("_v").alias("total_value"),
    )
    out = cur.withColumn("level", F.lit(levels[0]))
    for level in levels[1:]:
        cur = (
            cur.select(
                F.date_trunc(level, "bucket_ts").alias("bucket_ts"),
                "n_events",
                "total_value",
            )
            .groupBy("bucket_ts")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
            )
        )
        out = out.unionByName(cur.withColumn("level", F.lit(level)))
    return out.select("level", "bucket_ts", "n_events", "total_value")
