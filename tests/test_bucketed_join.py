"""Bucketed co-located join: the write-once-shuffle-never primitive for
repeatedly-joined tables at corpus scale. The test asserts the *physical
plan* property (zero Exchange operators when both sides are bucketed on the
join key) and cross-checks results against the plain shuffled join."""

import pyspark.sql.functions as F

from b_pdf_parser_spark.sources.sinks import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.count()  # force execution so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_runs_without_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "orders_b", str(tmp_path / "orders_b"), "o_orderkey", 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", str(tmp_path / "lineitem_b"), "o_orderkey", 4,
    )
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        # suppress broadcast so the alternative would be a shuffled SMJ —
        # the assert below is then meaningful
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            agg = joined.groupBy("o_orderkey").agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
            )
            plan = _executed_plan(agg)
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "Exchange" not in plan, plan
        # same join through the ordinary shuffled path must agree
        expected = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        )
        got = {r["o_orderkey"]: r["qty"] for r in agg.collect()}
        exp = {r["o_orderkey"]: r["qty"] for r in expected.collect()}
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_unbucketed_join_does_exchange(spark):
    """Control: the identical plan over plain parquet reads must contain the
    exchanges the bucketed layout removed (otherwise the assertion above is
    vacuous)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = orders.join(lineitem, "o_orderkey").groupBy("o_orderkey").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
        )
        plan = _executed_plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in plan
