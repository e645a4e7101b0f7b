"""Salted aggregation/join equal their unsalted equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memfuse_spark.operators.skew import replicated_salt_join, salted_count_sum


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key 1 has 500 rows; keys 2..20 have a handful
    rows = [(1, i, float(i % 7)) for i in range(500)] + [
        (k, 1000 + k * 10 + j, float(j)) for k in range(2, 21) for j in range(3)
    ]
    return spark.createDataFrame(rows, "key bigint, row_id bigint, value double")


def test_salted_agg_matches_plain(skewed):
    plain = {
        r.key: (r.n, round(r.total, 6))
        for r in skewed.groupBy("key")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .collect()
    }
    salted = {
        r.key: (r.n, r.total) for r in salted_count_sum(skewed, "key", "value", "row_id").collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(skewed):
    from memfuse_spark.operators.skew import DEFAULT_SALTS

    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(DEFAULT_SALTS))
    )
    hot = salted.filter("key = 1").groupBy("__salt").count().collect()
    assert len(hot) > DEFAULT_SALTS // 2  # hot key spread over most salts


def test_replicated_salt_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name-{k}") for k in range(1, 21)], "key bigint, name string"
    )
    plain = skewed.join(dim, "key").select("row_id", "name")
    salted = replicated_salt_join(skewed, dim, "key", "row_id").select("row_id", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
