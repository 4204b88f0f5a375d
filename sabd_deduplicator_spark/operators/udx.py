"""User-defined function taxonomy: Python UDTF, scalar pandas UDF, grouped-agg
pandas UDF (UDAF), and the null-aware anti-join (NOT IN) plan.

The reference has no UDF layer at all — every computation is host-language
Elixir around Ecto queries (SURVEY.md §2.B "UDF/UDAF/UDTF: none"). This module
closes that capability row for the new engine, demonstrating each extension
point the way it should be used at scale:

- scalar work: built-ins first (everything in operators/text.py is built-in);
  when Python is unavoidable, `@pandas_udf` — Arrow-batched, one Python worker
  round-trip per batch, never per row;
- aggregation: `pandas_udf` grouped-agg — partial aggregation does NOT apply
  (all rows of a group cross to Python), so keep groups bounded or pre-reduce
  with built-ins first;
- table functions: Python UDTF via LATERAL — row-at-a-time interface, the slow
  path by design; use for genuinely generative logic, not for things `explode`
  already does (text.py's tokenizers are the fast-path comparison);
- NOT IN with a nullable subquery: Spark plans a null-aware anti join
  (NullAwareAntiJoin in BroadcastNestedLoopJoin when the build side may hold
  NULL) — exercised here so the tri-valued-logic semantics are pinned by an
  oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.registry import query


# ---------------------------------------------------------------------------
# Python UDTF — lateral tokenize
# ---------------------------------------------------------------------------


class _TokenizeUDTF:
    """Emit (position, token) per single-space split — including empty tokens,
    so the DuckDB zip-unnest oracle is position-for-position identical.

    NB: decorated lazily inside the query — `udtf(returnType=...)` /
    `pandas_udf("ddl string")` parse their type strings through the active
    SparkSession, so decorating at import time fails before a session exists."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        # NULL text emits NO rows (string_split(NULL) unnests to nothing in
        # the oracle); empty string emits one empty token in both engines.
        # The old `text or ""` coalesced NULL into the empty-string case —
        # a one-extra-row-per-NULL-doc divergence the fuzz sweep caught.
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


@query(
    "udtf_tokenize_docs",
    oracle=(
        # parallel unnests zip in DuckDB: range(len) pairs with the tokens
        "SELECT doc_id, CAST(unnest(range(len(toks))) AS INT) AS pos, "
        "unnest(toks) AS token FROM "
        "(SELECT doc_id, string_split(text, ' ') AS toks FROM documents)"
    ),
)
def udtf_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF applied laterally per document row. Deliberately the slow
    path (row-at-a-time generator crossing the Python boundary) registered on
    a driver-bounded table; the built-in equivalent is
    `posexplode(split(text, ' '))` (used by text.py) which stays JVM-side —
    at 100 TB you use that, and reserve UDTFs for logic explode can't express."""
    # the driver supplies a vanilla session — force Arrow UDTF eval here too,
    # so the plan is ArrowEvalPythonUDTF (batched) not BatchEvalPythonUDTF
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("sabd_tokenize", udtf(_TokenizeUDTF, returnType="pos: int, token: string"))
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf_v")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM documents_udtf_v d, LATERAL sabd_tokenize(d.text) t"
    )


# ---------------------------------------------------------------------------
# Scalar pandas UDF — Arrow-vectorized per-row computation
# ---------------------------------------------------------------------------


def _utf8_bytes_udf():
    @pandas_udf("long")
    def _utf8_bytes(s: pd.Series) -> pd.Series:
        # nullable Int64, not int64: a NULL text row is NaN after the str
        # accessor, and astype(int64) raises IntCastingNaNError — Int64
        # round-trips the null through Arrow as SQL NULL (matching
        # octet_length(NULL) in both engines)
        return s.str.encode("utf-8").str.len().astype("Int64")

    return _utf8_bytes


@query(
    "pandas_scalar_utf8_bytes",
    oracle=(
        # encode(), not CAST(text AS BLOB): DuckDB's cast demands hex-escaped
        # non-ASCII and THROWS on real unicode (fuzz-parity finding);
        # encode() is the UTF-8 byte conversion
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS utf8_bytes, "
        "CAST(length(text) AS BIGINT) AS chars FROM documents"
    ),
)
def pandas_scalar_utf8_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow batches) next to the equivalent built-in:
    `utf8_bytes` crosses to Python vectorized, `chars` stays in codegen.
    The UDF is the API demonstration — `octet_length` exists as a built-in
    (F.octet_length) and is what the hot path should use."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _utf8_bytes_udf()("text").alias("utf8_bytes"),
        F.length("text").cast("long").alias("chars"),
    )


# ---------------------------------------------------------------------------
# Grouped-agg pandas UDF — a UDAF the built-ins genuinely lack pre-3.4
# ---------------------------------------------------------------------------


def _median_udaf_fn():
    @pandas_udf("double")
    def _median_udaf(v: pd.Series) -> float:
        return float(v.median())

    return _median_udaf


@query(
    "pandas_udaf_median_price",
    oracle=(
        "SELECT o_orderstatus, median(o_totalprice) AS median_price "
        "FROM orders GROUP BY o_orderstatus"
    ),
)
def pandas_udaf_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF computing an exact median per group. Unlike
    built-in aggregates there is NO partial aggregation — every row of a group
    ships to one Python worker, so this is only safe when groups are bounded
    (3 statuses here). At 100 TB use `percentile_approx` (see
    stats_aggregates_lineitem) or pre-reduce; linear-interpolation median on
    even counts matches DuckDB's `median` bit-for-bit because both average the
    two middle doubles. (Grouped-agg pandas UDFs cannot be mixed with built-in
    aggregates in one `agg` — [INVALID_PANDAS_UDF_PLACEMENT].)"""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        _median_udaf_fn()("o_totalprice").alias("median_price"),
    )


# ---------------------------------------------------------------------------
# Null-aware anti join — NOT IN over a nullable subquery
# ---------------------------------------------------------------------------


@query(
    "not_in_null_aware",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')"
    ),
)
def not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a subquery whose column is nullable: tri-valued logic means
    one NULL in the build side empties the result, so Spark cannot use a plain
    left_anti hash join — it plans a null-aware anti join. Kept as SQL so the
    Catalyst rewrite (RewritePredicateSubquery) is what's exercised; the
    hand-written equivalent needs an explicit `isNotNull` guard + left_anti.
    At scale: if the subquery column is provably non-null, filter NULLs first
    and use left_anti — broadcastable and partial-agg friendly."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_nia_v")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_nia_v")
    return spark.sql(
        "SELECT c_custkey, c_name FROM customer_nia_v "
        "WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders_nia_v WHERE o_orderstatus = 'P')"
    )
