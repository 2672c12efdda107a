"""Skew-handling primitives (SCALE.md shuffle-budget section).

AQE's skew-join splitting handles most runtime skew; these are the two
manual levers for when a key distribution is known-pathological (one
customer with 10% of all orders, a NULL-heavy FK, a hot shard key):

- :func:`two_phase_aggregate` — salt the groupBy key, pre-aggregate per
  (key, salt), then re-aggregate per key. Shuffle #1 spreads the hot key
  over ``salts`` reducers; shuffle #2 moves only ``|keys| x salts`` rows.
  Works for any algebraic aggregate (sum/count/min/max).
- :func:`salted_broadcast_join` — replicate the small side across salt
  values and join on (key, salt) so a hot key's rows spread across
  ``salts`` tasks instead of one straggler.

Salts are derived deterministically (xxhash64 of payload columns), so
results are reproducible — no ``rand()`` in plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _det_salt(df: DataFrame, exclude: list[str], salts: int) -> Column:
    """Deterministic per-row salt in [0, salts): hash of non-key columns
    (falls back to all columns if everything is excluded)."""
    cols = [c for c in df.columns if c not in exclude] or df.columns
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salts))


def two_phase_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salts: int = 16,
) -> DataFrame:
    """Skew-safe groupBy: ``aggs`` maps output name -> (refold, partial
    expression) where refold is 'sum' | 'min' | 'max' (the algebraic
    combiner applied to partial results).

    two_phase_aggregate(orders, ["o_custkey"],
        {"total": ("sum", F.sum(dec("o_totalprice"))),
         "n":     ("sum", F.count(F.lit(1)))})
    """
    salted = df.withColumn("__salt", _det_salt(df, keys, salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    refolds = []
    for name, (how, _) in aggs.items():
        p = F.col(f"__p_{name}")
        refolds.append({"sum": F.sum(p), "min": F.min(p), "max": F.max(p)}[how].alias(name))
    return partial.groupBy(*keys).agg(*refolds)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big table to a small table by replicating the small
    side ``salts`` times and joining on (key, salt). The small side must
    fit in memory x salts (it is broadcast)."""
    salt_values = F.array(*[F.lit(i) for i in range(salts)])
    small_rep = small.withColumn("__salt", F.explode(salt_values))
    big_salted = big.withColumn("__salt", _det_salt(big, [key], salts))
    return (
        big_salted.join(F.broadcast(small_rep), on=[key, "__salt"], how=how)
        .drop("__salt")
    )
