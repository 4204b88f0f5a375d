"""Skew mitigation utilities (SURVEY.md §4: chunk-hash distributions are
skewed by construction when content is highly duplicated — the 64-byte-period
fixture is one hash with 4,000+ occurrences).

Three layers of defense, outermost first:
1. aggregations: nothing to do — partial (map-side) aggregation already
   collapses hot keys before the shuffle (why build_hash_links needs no salt);
2. AQE skew-join splitting: enabled in session.py, handles joins at runtime;
3. explicit two-phase salted aggregation / salted join below, for operators
   where the engine can't help (e.g. collect_list per hot key, or
   non-AQE-eligible joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the row content is preferable to
    rand() (reproducible plans, no RNG state); xxhash64 of all columns mod n
    spreads a hot key across n reducers."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_count(
    df: DataFrame, key: str | Column, n_salts: int = 16, out: str = "cnt"
) -> DataFrame:
    """Two-phase count for pathologically hot keys: count per (key, salt),
    then sum per key. Shuffle 1 carries ≤ n_salts rows per hot key partition;
    shuffle 2 carries ≤ n_salts rows per key total."""
    k = F.col(key) if isinstance(key, str) else key
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(k, F.monotonically_increasing_id()), F.lit(n_salts)))
    partial = salted.groupBy(k.alias("key"), "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy("key").agg(F.sum("_c").alias(out))


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salts: int = 16,
) -> DataFrame:
    """Manual skew join: replicate the small side n_salts× for hot keys and
    scatter the big side's hot rows across salts; cold keys join normally.
    Only needed where AQE skew splitting can't reach (e.g. bucketed inputs
    pinned to their partitioning). hot_keys: single-column DF of `key`."""
    hot = F.broadcast(hot_keys.select(F.col(key)).distinct())
    big_hot = big.join(hot, key, "left_semi").withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")
    )
    big_cold = big.join(hot, key, "left_anti").withColumn("_salt", F.lit(0))
    small_hot = (
        small.join(hot, key, "left_semi")
        .crossJoin(F.broadcast(
            big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        ))
    )
    small_cold = small.join(hot, key, "left_anti").withColumn("_salt", F.lit(0))
    return big_hot.unionByName(big_cold).join(
        small_hot.unionByName(small_cold), [key, "_salt"]
    ).drop("_salt")
