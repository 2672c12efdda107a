"""Bloom-filter semi-join reduction: no false negatives, bounded false
positives, real pruning on the catalog query's shape, and a pin that
this Spark version injects its native runtime bloom filter once the
size thresholds are met (the 100 TB default path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_fresh_sql_data_engineering_spark.operators.bloom import (
    BloomFilter,
    bloom_prefilter,
    build_bloom,
)


def test_bloom_never_drops_a_member(spark):
    keys = spark.range(0, 5000, 7).withColumnRenamed("id", "k")
    bloom = build_bloom(keys, "k", num_bits=1 << 14, num_hashes=5)
    survivors = bloom_prefilter(keys, "k", bloom).count()
    assert survivors == keys.count()


def test_bloom_false_positive_rate_bounded(spark):
    members = spark.range(0, 10000).withColumnRenamed("id", "k")
    bloom = build_bloom(members, "k", num_bits=1 << 17, num_hashes=5)
    # disjoint probe population
    probes = spark.range(1_000_000, 1_020_000).withColumnRenamed("id", "k")
    fp = bloom_prefilter(probes, "k", bloom).count()
    # n/m = 10000/131072, k=5 -> theoretical fpp ~0.3%; assert well under 2%
    assert fp / 20000 < 0.02, fp
    # bitmap is genuinely populated, not degenerate
    assert 0 < bloom.set_bits < bloom.num_bits


def test_bloom_prunes_before_exact_join(spark, sf_dir):
    from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    l = load_table(spark, sf_dir, "lineitem")
    bloom = build_bloom(o, "o_orderkey")
    pruned = bloom_prefilter(l, "l_orderkey", bloom)
    total, kept = l.count(), pruned.count()
    exact = l.join(o, l.l_orderkey == o.o_orderkey, "left_semi").count()
    # superset of the exact semi-join, but a real reduction of the shuffle
    assert exact <= kept < 0.5 * total, (exact, kept, total)


def test_bloom_scratch_column_guard(spark):
    df = spark.range(10).withColumn("__bl_p0", F.lit(1))
    bloom = BloomFilter(words=[0] * 4, num_bits=256, num_hashes=2)
    with pytest.raises(ValueError, match="__bl_"):
        bloom_prefilter(df, "id", bloom)


def test_native_runtime_bloom_filter_injects(spark, sf_dir):
    """Pin the scale-path recipe: with the application-side size gate
    lowered (it exists precisely because this only pays off on big
    scans), Catalyst injects might_contain on the probe side of a
    selective shuffle join. At 100 TB the default 10 GB gate triggers
    without any conf change."""
    from amazon_fresh_sql_data_engineering_spark.sources.loaders import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = load_table(spark, sf_dir, "lineitem")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
