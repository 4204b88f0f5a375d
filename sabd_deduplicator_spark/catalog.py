"""Catalog: the driver's parquet tables (TESTDATA.md) and load helpers.

Mirrors the reference's catalog role (`files` table,
/root/reference/lib/deduplicator/files.ex:15-23) — schema/config travels
through a catalog, not the data files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Resolved-base-table memo (r12, guide §6 "file listing is cached per
# session"): every spark.read.parquet call re-runs DataSource resolution,
# parquet-footer schema inference and InMemoryFileIndex construction on the
# driver — measured 80-110 ms PER CALL at sf0.1, paid inside the timed
# region of every query build (2-4 table() calls each), the single largest
# term of the sub-second tail's fixed overhead. A production engine reads
# this metadata from a catalog (metastore schema, Iceberg/Delta manifests)
# exactly once; this memo is that catalog: it caches the resolved
# DataFrame PLAN object (schema + file index — metadata only, zero rows;
# every execution still scans the parquet), keyed by application, path and
# the same (mtime, size) staleness token the engine's other memos use, so
# a regenerated file re-resolves instead of serving a stale listing.
_TABLE_MEMO: dict[tuple[str, str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Parquet scan → column pruning and predicate
    pushdown reach the file reader for free once filters/selects are applied."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, name, source_token(sf_dir, name))
    hit = _TABLE_MEMO.get(key)
    if hit is not None:
        return hit
    evict_dead_app_entries(_TABLE_MEMO, app_id)
    # drop stale tokens for the same (app, dir, table) so regenerated tmp
    # corpora don't accumulate dead FileIndex entries
    for k in [k for k in _TABLE_MEMO if k[:3] == key[:3]]:
        del _TABLE_MEMO[k]
    _TABLE_MEMO[key] = _load_table(spark, sf_dir, name)
    return _TABLE_MEMO[key]


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects outright
        # (PARQUET_TYPE_ILLEGAL). Read nanos as long, truncate to micros (the
        # same truncation DuckDB applies), and build a TIMESTAMP_NTZ via pure
        # interval arithmetic — no session-timezone dependence anywhere, so
        # results match the naive values DuckDB sees whatever TZ the driver's
        # session runs in.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestamp_ntz '1970-01-01 00:00:00' + "
                    "make_interval(0, 0, 0, 0, 0, 0, cast(ts div 1000 as decimal(18,0)) / 1000000)"
                ),
            )
        return df
    return _tz_normalize(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _tz_normalize(df: DataFrame) -> DataFrame:
    """Parquet timestamps here are naive (isAdjustedToUTC=false); Spark 4
    reads them as TIMESTAMP_NTZ by default (inferTimestampNTZ). If a session
    disables that, the LTZ round-trip below recovers the same naive wall
    clock; queries therefore always see NTZ, matching the DuckDB oracle."""
    ts_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampType)]
    for c in ts_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def source_token(sf_dir: str, name: str) -> str:
    """Staleness token for one driver table: the parquet path plus its
    (max mtime_ns, total size) — walked over part files when the path is a
    directory. Module-level memos key derived values by this token instead
    of the bare path, so an in-process regeneration of the same path
    (empty→non-empty tmp corpora in test sweeps) invalidates them naturally
    rather than serving a stale frame — the discipline streaming._stage
    established for its staged input copies."""
    import os

    return path_token(os.path.join(sf_dir, f"{name}.parquet"))


def path_token(path: str) -> str:
    """source_token over an arbitrary file-or-directory path (staged stream
    sources, scratch corpora): path plus (max mtime_ns, total size)."""
    import os

    try:
        if os.path.isdir(path):
            mt, sz = 0, 0
            for root, _dirs, files in os.walk(path):
                for fn in files:
                    st = os.stat(os.path.join(root, fn))
                    mt = max(mt, st.st_mtime_ns)
                    sz += st.st_size
            return f"{path}:{mt}:{sz}"
        st = os.stat(path)
        return f"{path}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return f"{path}:missing"


def evict_dead_app_entries(memo: dict, app_id: str) -> None:
    """Drop memo entries owned by OTHER Spark applications at insert time.
    localCheckpoint'ed DataFrames pin executor storage blocks for as long
    as a Python reference survives; a long-lived process that cycles many
    sessions (test suites sweeping tmp corpora) must not accumulate blocks
    for applications that no longer exist. Callers key such memos by tuples
    whose FIRST element is sparkContext.applicationId."""
    for k in [k for k in memo if isinstance(k, tuple) and k and k[0] != app_id]:
        del memo[k]


def spread_if_narrow(df: DataFrame) -> DataFrame:
    """Fan a ROW-STARVED scan out to full cluster width before a CPU-heavy
    derivation (shingle/token explodes, per-row digests).

    Parquet scans parallelize by file split; a corpus that fits in a couple
    of splits (single-digit MB at test scale, or one unsplittable row
    group) pins everything downstream of it to 1-2 cores until the first
    shuffle. The fix is adaptive, not unconditional: repartition ONLY when
    the scan's partition count is under half the cluster width — so at
    100 TB (thousands of splits) this is a no-op with zero added Exchange,
    while at row-starved scale the shuffled bytes are bounded by the very
    condition that triggers it (few splits ⇒ few hundred MB at most).
    Measured: minhash_lsh_neardup 2.3 → 1.3 s at sf0.1 (explode + digest
    ran on ONE core before)."""
    sc = df.sparkSession.sparkContext
    width = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, width // 2):
        return df.repartition(width)
    return df
