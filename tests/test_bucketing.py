"""Bucketed co-located join (scale directive: 'repartition()/bucketing
for co-located joins'): persisting both sides of a big-big equi-join
bucketed on the join key lets Spark plan the join with ZERO shuffle on
either side — at 100 TB this turns the nightly orders⋈lineitem-style
join from the dominant shuffle into a local merge per bucket. The
pipeline itself needs no big-big joins (hash surrogate ids remove
them), so this is exercised on the shared TPC-H-ish tables."""

import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # tables land in the default ./spark-warehouse (gitignored);
    # warehouse.dir is a static conf and can't move per-test
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("orders_b"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("lineitem_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _executed_plan(joined).split("== Initial Plan ==")[0]
        # the join itself must consume the bucketed layout directly
        # (scans show Bucketed: true): no exchange beneath the
        # SortMergeJoin — the single exchange allowed is the final
        # groupBy aggregation
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        n_exchanges = len(re.findall(r"\bExchange hashpartitioning", plan))
        assert n_exchanges <= 1, f"bucketed join still shuffles:\n{plan[:2000]}"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = {
        (r.o_orderpriority, r.n)
        for r in orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        (r.o_orderpriority, r.n)
        for r in spark.table("orders_b")
        .join(spark.table("lineitem_b"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
