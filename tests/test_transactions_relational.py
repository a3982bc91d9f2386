"""The pure-relational transaction derivation (window sessionization, P8
option b) must equal the UDF cursor walk on the column-layout corpus —
each path is the other's oracle."""

import pyspark.sql.functions as F

from b_pdf_parser_spark.operators.extract import extract_pages
from b_pdf_parser_spark.plans.transactions_relational import transactions_relational
from b_pdf_parser_spark.plans.verify import transactions_table
from b_pdf_parser_spark.sources.pages import synth_pages_df

COLS = ["url", "seq", "date", "description", "user", "debit", "credit", "balance"]


def test_relational_equals_udf_walk(spark):
    ext = extract_pages(
        synth_pages_df(spark, 250, seed=55, num_partitions=4), num_partitions=8
    ).cache()
    col_docs = ext.filter(F.col("txn_strategy") == "column").localCheckpoint()
    ext.unpersist()
    assert col_docs.count() > 50
    a = transactions_table(col_docs).select(COLS)
    b = transactions_relational(col_docs).select(COLS)
    assert a.count() == b.count() > 500
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_relational_plan_is_python_free(spark):
    from b_pdf_parser_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, 10, seed=1, num_partitions=2)
    # feed plain text rows (no extraction) to inspect the relational subtree
    docs = pages.select("url", F.coalesce("text", F.lit("")).alias("text"))
    plan = transactions_relational(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan.replace("MapInPandas", "")  # window+agg only