"""As-of join — one of the classic operators Spark's DataFrame API lacks
(named in the task statement's custom-operator examples; DuckDB/kdb/Pandas
``merge_asof`` have it natively).

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
