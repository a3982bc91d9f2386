"""Temporal join operators.

``asof_join`` gives Spark the AS-OF (point-in-time) join the reference's
query surface implies for event/statement alignment (the reference joins
each summary line to the *latest preceding* value row — SURVEY §2 J3 —
which is exactly an as-of join when lifted to timestamped tables).

Scale design — why union+window instead of a range join:

* A naive implementation is ``left JOIN right ON key AND r.ts <= l.ts``
  + a max-per-left aggregate: the inequality join explodes to
  O(|left| × matches) rows *before* the aggregate prunes them, and Spark
  plans it as BroadcastNestedLoop/cartesian when the equi-key is skewed.
* The union+window form never materialises a single extra row: both sides
  are unioned (a free narrow op), shuffled ONCE on the join key, sorted
  within each key partition by (ts, side), and the right-side payload is
  carried forward with ``last(ignorenulls)`` over an unbounded-preceding
  running window — a single pass, fully whole-stage-codegen, identical to
  the merge phase of a sort-merge as-of join (the algorithm DuckDB/kdb use
  natively).
* Cost at 10^12 rows: one exchange of |left| + |right| rows keyed on the
  join key, no replication. Skewed keys behave like any groupBy (AQE skew
  handling applies); there is no quadratic term anywhere.

Tie semantics match DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``: an event at
exactly the right-side timestamp sees that row (the right row sorts first
within equal ts). Ties *within* the right side at the same (key, ts) are
resolved deterministically toward the greatest tiebreak column before the
union, so both engines agree row-for-row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
) -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` and ``right_on = left_on`` (backward as-of join,
    inclusive). ``payload`` maps right-side column → output alias. Left rows
    with no preceding right row keep NULL payload columns (left semantics).

    Right-side duplicates at the same (key, ts) are collapsed first by
    taking the per-column max payload, making the result deterministic in
    both Spark and the DuckDB oracle (which pre-collapses the same way).
    """
    pay_cols = list(payload.items())

    r = (
        right.groupBy(F.col(right_on).alias("_k"), F.col(right_ts).alias("_ts"))
        .agg(*[F.max(src).alias(f"_p_{alias}") for src, alias in pay_cols])
        .withColumn("_side", F.lit(0))
    )
    l_cols = [F.col(c) for c in left.columns]
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *l_cols,
    )
    for _, alias in pay_cols:
        l = l.withColumn(f"_p_{alias}", F.lit(None).cast(r.schema[f"_p_{alias}"].dataType))
    u = l.unionByName(r, allowMissingColumns=True)

    # one exchange on _k; right rows (_side 0) sort before left rows at the
    # same _ts so an equal-timestamp payload is visible (inclusive >=)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_p_{alias}", ignorenulls=True).over(w).alias(alias)
            for _, alias in pay_cols
        ],
    )
    out_cols = [c for c in left.columns] + [alias for _, alias in pay_cols]
    return filled.filter(F.col("_side") == 1).select(*out_cols)
