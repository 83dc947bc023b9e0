"""Scale-path demonstration: bucketed tables make repeated fact-fact
joins shuffle-free. At 100 TB you bucket the fact tables on their join
key at ingest; every subsequent join/aggregation on that key reads
co-located buckets and Catalyst elides the Exchange entirely.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from database_to_bigquery_spark.data import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    warehouse = tempfile.mkdtemp(prefix="bucketed_wh_")
    spark.conf.set("spark.sql.legacy.allowNonEmptyLocationInCTAS", "true")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    for name, df, key in [("orders_b", orders, "o_orderkey"), ("lineitem_b", li, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{warehouse}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield ("orders_b", "lineitem_b")
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


@pytest.fixture()
def no_broadcast(spark):
    # at fixture scale everything broadcasts, which would bypass the
    # bucketed-join path this test demonstrates; at 100 TB a fact-fact
    # join can't broadcast, so force the non-broadcast plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, no_broadcast):
    orders_b, lineitem_b = bucketed_tables
    joined = (
        spark.table(lineitem_b)
        .join(spark.table(orders_b), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: the join itself needs no Exchange; the only
    # shuffle is the final 5-key aggregate
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert join_part.count("Exchange") == 0, plan
    # and it still computes the right thing
    li = spark.table(lineitem_b)
    assert joined.agg(F.sum("n")).first()[0] == li.count()


def test_bucketed_agg_reuses_layout(spark, bucketed_tables):
    _, lineitem_b = bucketed_tables
    agg = spark.table(lineitem_b).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # bucket layout satisfies the agg's distribution
