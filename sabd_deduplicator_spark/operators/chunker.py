"""Fixed-size chunk scan (SURVEY.md §2.A #1).

Reference: /root/reference/lib/deduplicator/binary_utils.ex:14-24 splits a
binary into fixed-n-byte pieces (last piece may be short);
/root/reference/lib/deduplicator/files.ex:45-56 streams a file through it.

Spark-first design: chunking is a *generator expression* —
``sequence → transform → posexplode`` — fully inside whole-stage codegen, no
Python. The stream position becomes an explicit ``line`` column (Spark has no
implicit row order; SURVEY.md §4 hazard 1). At 100 TB this runs embarrassingly
parallel per input row with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sabd_deduplicator_spark import catalog
from sabd_deduplicator_spark.registry import query

DEFAULT_CHUNK_SIZE = 16


def chunk_fixed(
    df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """Explode ``text_col`` into ≤``size``-char chunks with a 0-based ``line``.

    Guard: ``sequence(0, -1)`` in Spark produces a *descending* [0, -1] array
    (not empty!), so empty strings must short-circuit to array() explicitly —
    an empty input yields zero chunks (binary_utils.ex:16-17 base case).
    """
    if size <= 0:
        raise ValueError("chunk size must be positive")
    arr = F.expr(
        f"CASE WHEN length({text_col}) = 0 OR {text_col} IS NULL THEN array() "
        f"ELSE transform(sequence(0, cast(ceil(length({text_col}) / {size}.0) AS INT) - 1), "
        f"i -> substring({text_col}, i * {size} + 1, {size})) END"
    )
    return df.select(
        *id_cols, F.posexplode(arr).alias("line", "chunk")
    ).withColumn("line", F.col("line").cast("long"))


def chunks_cte(size: int = DEFAULT_CHUNK_SIZE) -> str:
    """DuckDB CTE producing the identical (doc_id, line, chunk) relation over
    ``documents`` — shared by every dedup-family oracle."""
    # DuckDB 1.0 rejects lateral column args to the generate_series TABLE
    # function; scalar range() + unnest() in a projection is the portable form.
    return (
        f"SELECT doc_id, CAST(i AS BIGINT) AS line, "
        f"substring(text, CAST(i * {size} + 1 AS INT), {size}) AS chunk "
        f"FROM (SELECT doc_id, text, "
        f"unnest(range(0, CAST(ceil(length(text) / {size}.0) AS BIGINT))) AS i "
        f"FROM documents) u"
    )


def doc_chunks(spark: SparkSession, sf_dir: str, size: int = DEFAULT_CHUNK_SIZE) -> DataFrame:
    """(doc_id, line, chunk) over the driver's ``documents`` table."""
    return chunk_fixed(catalog.table(spark, sf_dir, "documents"), size=size)


@query(
    "chunk_scan_fixed",
    oracle=f"SELECT doc_id, line, chunk FROM ({chunks_cte()}) c",
)
def chunk_scan_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_chunks(spark, sf_dir)


@query(
    "chunk_scan_invariants",
    oracle=(
        # Chunker invariants from the reference's unit tests
        # (test/deduplicator_test.exs:25-47): per file, chunk sizes sum to the
        # original length, count = ceil(len/size), max line = count-1,
        # and every chunk except possibly the last is exactly `size` long.
        f"SELECT c.doc_id, "
        f"CAST(sum(length(c.chunk)) AS BIGINT) AS total_chars, "
        f"count(*) AS n_chunks, "
        f"CAST(max(c.line) AS BIGINT) AS max_line, "
        f"CAST(sum(CASE WHEN length(c.chunk) = {DEFAULT_CHUNK_SIZE} THEN 0 ELSE 1 END) AS BIGINT) AS n_short "
        f"FROM ({chunks_cte()}) c GROUP BY c.doc_id"
    ),
)
def chunk_scan_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = doc_chunks(spark, sf_dir)
    return c.groupBy("doc_id").agg(
        F.sum(F.length("chunk")).alias("total_chars"),
        F.count("*").alias("n_chunks"),
        F.max("line").alias("max_line"),
        F.sum(
            F.when(F.length("chunk") == DEFAULT_CHUNK_SIZE, 0).otherwise(1)
        ).cast("long").alias("n_short"),
    )
