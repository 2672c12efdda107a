"""Explicit bloom-filter semi-join reduction (SCALE.md shuffle-budget
section).

Spark's own runtime row-level bloom filter (``spark.sql.optimizer.
runtime.bloomFilter.enabled``) injects ``might_contain`` prefilters
automatically when the application side scans >10 GB — the right default
at 100 TB, and ``tests/test_plans.py`` pins that this Spark version does
inject it once the thresholds are met. This module is the *explicit*
form of the same reduction for when the optimizer cannot see the
opportunity (the build side is computed by a separate job, or the probe
side must be pruned before an expensive UDF stage, or the filter has to
cross a materialization boundary):

- :func:`build_bloom` aggregates the build side's keys into a fixed-size
  bitmap DISTRIBUTED (explode k probe positions -> bit_or per 64-bit
  word), so the driver only ever collects ``num_bits / 64`` words of
  metadata regardless of key count — never the keys themselves.
- :func:`bloom_prefilter` applies the bitmap to the probe side as pure
  JVM expressions (shiftleft / bitwise AND / element_at on an inlined
  array literal — the local analog of a broadcast variable), so the
  pruning runs inside whole-stage codegen with no Python in the path.

The filter is a SUPERSET filter (false positives only, never false
negatives — k independent xxhash64 probes per key), so following it with
the exact join keeps results exact while the shuffle moves only
``~fpp``-inflated survivors instead of the full probe side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    """Driver-held bitmap: ``num_bits`` total, as ``num_bits // 64``
    little-endian 64-bit words. Metadata-sized by construction."""

    words: list[int]
    num_bits: int
    num_hashes: int

    @property
    def set_bits(self) -> int:
        return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in self.words)


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k probe positions: xxhash64 seeded by probe index via an extra
    hashed literal — identical expressions on build and probe sides."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> BloomFilter:
    """Aggregate ``df[key]``'s values into a bloom bitmap.

    The shuffle carries at most ``num_bits / 64`` (word, bits) rows after
    map-side bit_or partials; the collect is bounded the same way. 2^17
    bits (16 KiB) holds ~15k keys at fpp < 2% with k=5; size up per
    expected key count (m ~ -n*ln(fpp)/ln(2)^2).
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    key_col = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(key_col, num_bits, num_hashes))).alias(
        "__bl_pos"
    )
    words = (
        df.select(pos)
        .select(
            F.expr("shiftright(__bl_pos, 6)").alias("word"),
            F.expr("shiftleft(1L, CAST(__bl_pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for r in words:
        dense[r.word] = r.bits
    return BloomFilter(words=dense, num_bits=num_bits, num_hashes=num_hashes)


def bloom_prefilter(df: DataFrame, key, bloom: BloomFilter) -> DataFrame:
    """Keep only rows whose key might be in ``bloom`` (superset of the
    exact semi-join; follow with the exact join for exact results)."""
    key_col = F.col(key) if isinstance(key, str) else key
    scratch = [c for c in df.columns if c.startswith("__bl_")]
    if scratch:
        raise ValueError(f"input already has bloom scratch columns: {scratch}")
    probed = df.withColumn("__bl_words", F.lit(bloom.words))
    for i, p in enumerate(_positions(key_col, bloom.num_bits, bloom.num_hashes)):
        probed = probed.withColumn(f"__bl_p{i}", p)
    pred = F.lit(True)
    for i in range(bloom.num_hashes):
        pred = pred & F.expr(
            f"(element_at(__bl_words, CAST(shiftright(__bl_p{i}, 6) AS INT) + 1)"
            f" & shiftleft(1L, CAST(__bl_p{i} % 64 AS INT))) != 0"
        )
    return probed.filter(pred).drop(
        "__bl_words", *[f"__bl_p{i}" for i in range(bloom.num_hashes)]
    )
