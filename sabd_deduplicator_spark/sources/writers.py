"""Sinks (SURVEY.md §2.A #10, #11, #17 and §2.B sinks row).

Reference sinks: buffered binary writes of the encoded file
(/root/reference/lib/deduplicator.ex:132), bulk Postgres insert_all
(/root/reference/lib/deduplicator/hash.ex:66-79), conflict-ignoring upsert
(on_conflict: :nothing), optional zip compression
(/root/reference/lib/deduplicator/files.ex:64-76 — which is buggy: writes zip
but reads gzip; we use Parquet codecs instead, SURVEY.md §4 hazard 5).

Scale posture:
- append_parquet: codec option (zstd default — best ratio/speed tradeoff);
- partitioned writes: partitionBy low-cardinality keys → partition pruning;
- bucketed tables: bucketBy(hash) → bucket-pruned, shuffle-free joins on the
  index key (replaces the reference's Postgres B-tree PK);
- append_if_absent: the conflict-ignoring upsert as left_anti + append —
  same observable semantics as `on_conflict: :nothing`, set-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def append_parquet(df: DataFrame, path: str, compression: str = "zstd") -> None:
    df.write.mode("append").option("compression", compression).parquet(path)


def overwrite_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def save_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str | list[str],
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist bucketed by the join key(s): two tables bucketed the same way
    join with ZERO shuffle — the scalable stand-in for the reference's index
    B-tree. ``bucket_col`` may be a composite key (list), e.g. the MinHash
    band key (band, x, y). Bucket metadata lives in the session catalog, so
    this is saveAsTable, not a bare path write; pass ``path`` to make it an
    EXTERNAL table whose data files land at a caller-chosen directory
    (index builds use a scratch dir, keeping the warehouse dir clean)."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, cols[0], *cols[1:])
        .sortBy(cols[0], *cols[1:])
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", compression: str | None = None
) -> None:
    """Format-agnostic sink over Spark's native formats (parquet/orc for
    columnar interchange, json/csv for text interchange). Default codecs:
    zstd for the columnar pair, gzip for the text pair (zstd is not a
    universal text-source codec). ORC matters for interchange with
    Hive/Trino estates; it shares parquet's pruning/pushdown behavior in
    Spark, so the engine's scan discipline carries over unchanged."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    codec = compression or ("zstd" if fmt in ("parquet", "orc") else "gzip")
    w = df.write.mode("overwrite").option("compression", codec)
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)


def read_table(spark, path: str, fmt: str = "parquet", schema: str | None = None):
    """Format-agnostic source matching `write_table`. For the text formats a
    schema string is required to round-trip types (csv/json carry no type
    system worth trusting); columnar formats self-describe."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
    return r.format(fmt).load(path)


def append_if_absent(
    new_rows: DataFrame, existing: DataFrame, key: str, path: str,
    compression: str = "zstd",
) -> DataFrame:
    """Conflict-ignoring upsert (#11): keep only keys not already present,
    then append. Returns the appended subset (for verification). left_anti is
    a single shuffle (or broadcast when `existing` keys are small)."""
    fresh = new_rows.join(existing.select(key).distinct(), key, "left_anti")
    fresh.write.mode("append").option("compression", compression).parquet(path)
    return fresh


def compact_parquet(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd", transform=None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files sized
    ~target_file_bytes. Returns the output file count.

    Streaming sinks and incremental appends (append_if_absent, foreachBatch
    index builds) accrete small files; at 100 TB the scan-planning and
    open-file overhead of millions of tiny files dominates query time, so
    periodic compaction is a first-class maintenance op (the parquet-level
    analog of Delta OPTIMIZE). File count = ceil(on-disk bytes / target);
    on-disk (compressed) size is the available proxy for output size — same
    codec in and out keeps the estimate honest.

    Swap protocol: stage NEXT TO the live dir (same filesystem, so both moves
    are true renames, never slow cross-device copies), verify the staged copy
    is readable and row-complete BEFORE touching the live path, then swap via
    two renames and drop the backup only after the swap lands. A crash midway
    leaves either the old dir live or the data intact in `.pre_compact` with
    an exception raised — never a silent loss. POSIX has no two-directory
    atomic exchange, so concurrent readers can observe a missing path for the
    instant between the two renames; single-writer maintenance windows (or a
    pointer-file indirection like streaming/index_sink.py's) are the
    production answer.

    `transform` (optional, DataFrame → DataFrame): a deterministic
    row-level rewrite applied DURING compaction — the deletion-vector
    pattern (Delta OPTIMIZE applying DVs): logical deletes accumulate as a
    side list the readers anti-join, and the compaction pass is where rows
    physically leave the files. Row verification compares the staged copy
    against the TRANSFORMED live relation, so a transform that drops rows
    still verifies exactly."""
    import math
    import os
    import shutil
    from pathlib import Path

    src = Path(path).resolve()
    total = sum(f.stat().st_size for f in src.rglob("*.parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    live = spark.read.parquet(str(src))
    if transform is not None:
        live = transform(live)
    live_rows = live.count()
    staging = src.with_name(src.name + ".compact_staging")
    if staging.exists():
        shutil.rmtree(staging)
    (
        live
        .repartition(n_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(str(staging))
    )
    staged_rows = spark.read.parquet(str(staging)).count()
    if staged_rows != live_rows:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"compaction aborted: staged copy has {staged_rows} rows, live has "
            f"{live_rows}; live directory untouched"
        )
    backup = src.with_name(src.name + ".pre_compact")
    if backup.exists():
        shutil.rmtree(backup)
    os.rename(src, backup)
    try:
        os.rename(staging, src)
    except BaseException:
        os.rename(backup, src)  # restore the live path, then surface the error
        raise
    shutil.rmtree(backup)
    return n_files
