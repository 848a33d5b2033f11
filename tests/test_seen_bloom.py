"""Bloom seen-filter unit tests: no false negatives, bounded FP rate,
treeAggregate merge correctness."""
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sparkharvester.seen import BloomFilter, _params, build_bloom


def test_no_false_negatives():
    bf = BloomFilter(*_params(10_000, 0.01))
    keys = pd.Series([f"k{i}" for i in range(10_000)])
    bf.add_series(keys)
    assert bf.contains_series(keys).all()


def test_fp_rate_bounded():
    bf = BloomFilter(*_params(10_000, 0.01))
    bf.add_series(pd.Series([f"k{i}" for i in range(10_000)]))
    unseen = pd.Series([f"x{i}" for i in range(50_000)])
    fp = bf.contains_series(unseen).mean()
    assert fp < 0.05


def test_merge_is_union():
    p = _params(1000, 0.01)
    a, b = BloomFilter(*p), BloomFilter(*p)
    a.add_series(pd.Series(["a1", "a2"]))
    b.add_series(pd.Series(["b1"]))
    a.merge(b)
    assert a.contains_series(pd.Series(["a1", "a2", "b1"])).all()


def test_distributed_build_matches_local(spark):
    df = spark.range(5000).select(
        F.concat(F.lit("u"), F.col("id")).alias("k")
    ).repartition(8)
    bf = build_bloom(df, "k", expected_items=5000)
    local = BloomFilter(bf.n_bits, bf.k)
    local.add_series(pd.Series([f"u{i}" for i in range(5000)]))
    assert np.array_equal(bf.bits, local.bits)
