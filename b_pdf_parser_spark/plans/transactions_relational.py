"""Relational re-derivation of the transaction line walk (SURVEY P8 option b).

The byte-exact path is the per-document cursor walk inside the Arrow batch
(fields.extract_transactions). This module re-derives the same result for
clean column-layout documents with pure DataFrame operators:

    posexplode(split(text, '\\n'))               one row per line
    → anchor = line rlike date-time pattern      (P6)
    → txn_id = sum(anchor) over (url, pos)       running window (W1)
    → groupBy(url, txn_id): sort_array(collect)  one array per transaction
    → field assignment by classifier positions   (P7 predicates, W3 ranks)

Cursor-walk semantics reproduced: description lines run until the first
numeric-ish line; that head line selects the branch — 6-8 digit user id
(debit/credit/balance follow), decimal amount (no user; head is the debit),
anything else is out of the clean grammar and dropped here (the UDF's
degenerate-input fallbacks are its own job). The e2e test asserts equality
with the UDF path over the synthetic column-layout corpus — this plan is
the cross-check oracle for the hot-path implementation, the same role
DuckDB plays for the SQL-expressible operators.

Scale shape: one explode (map-side), one shuffle on url for the window, one
hash aggregate on (url, txn_id). No Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["transactions_relational"]

_ANCHOR = r"^\d{2}/\d{2}/\d{2}\s+\d{2}:\d{2}:\d{2}"
_NUMERICISH = r"^[\d,.]+$"
_USERID = r"^\d{6,8}$"
_AMOUNT = r"^[\d,]+\.\d{2}$"


def transactions_relational(extracted: DataFrame, text_col: str = "text") -> DataFrame:
    """url → (seq, date, description, user, debit, credit, balance) rows."""
    lines = (
        extracted.select(
            "url", F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw")
        )
        .select("url", "pos", F.trim("raw").alias("line"))
        .filter(F.col("line") != "")
    )

    anchor = F.col("line").rlike(_ANCHOR)
    run = Window.partitionBy("url").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    grouped = lines.select(
        "url", "pos", "line", F.sum(anchor.cast("int")).over(run).alias("txn_id")
    ).filter(F.col("txn_id") > 0)

    txn = grouped.groupBy("url", "txn_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("ls")
    )

    # first numeric-ish line after the date = the description terminator
    # (index-aware transform + get(): ANSI-safe, no OOB throws)
    numericish_sql = _NUMERICISH.replace("\\", "\\\\")  # SQL literal escaping
    txn = txn.withColumn(
        "head_idx",
        F.expr(
            "array_min(transform(filter("
            "  transform(ls, (x, i) -> named_struct('i', i, 'l', x.line)),"
            f"  s -> s.i >= 1 AND s.l rlike '{numericish_sql}'), s -> s.i))"
        ),
    ).where(F.col("head_idx").isNotNull())

    head = F.expr("get(ls, head_idx).line")
    user_branch = head.rlike(_USERID)
    amount_branch = ~user_branch & head.rlike(_AMOUNT)

    def field(user_off: int, amount_off: int):
        return (
            F.when(user_branch, F.expr(f"get(ls, head_idx + {user_off}).line"))
            .when(amount_branch, F.expr(f"get(ls, head_idx + {amount_off}).line"))
            .otherwise(F.lit(None))
        )

    return (
        txn.where(user_branch | amount_branch)
        .select(
            "url",
            (F.col("txn_id") - 1).cast("int").alias("seq"),
            F.expr("get(ls, 0).line").alias("date"),
            F.when(
                F.col("head_idx") > 1,
                F.expr("array_join(transform(slice(ls, 2, head_idx - 1), x -> x.line), ' ')"),
            ).otherwise(F.lit("")).alias("description"),
            F.when(user_branch, head).otherwise(F.lit("")).alias("user"),
            F.coalesce(
                F.when(user_branch, F.expr("get(ls, head_idx + 1).line"))
                .when(amount_branch, head),
                F.lit(""),
            ).alias("debit"),
            F.coalesce(field(2, 1), F.lit("")).alias("credit"),
            F.coalesce(field(3, 2), F.lit("")).alias("balance"),
        )
    )
