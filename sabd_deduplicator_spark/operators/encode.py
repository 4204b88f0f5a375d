"""Encode / decode / recovery (SURVEY.md §2.A #13, #14, #16).

Token grammar (/root/reference/lib/deduplicator/binary_utils.ex:4-7):
    '0' || chunk                      — first occurrence, literal
    '1' || lpad(first_line, W, '0')   — repeat, pointer to first occurrence

Engine decisions vs the reference (SURVEY.md §4 hazards):
- pointer width W is a PARAMETER (reference hardcodes 4 → silent corruption
  past 9999 chunks, binary_utils.ex:42-45), and encode raises loudly on a
  pointer that would not fit in W digits instead of truncating; size W with
  required_pointer_width() when chunk counts are unbounded;
- pointer "0000" decodes fine via a plain int cast (reference crashes:
  deduplicator.ex:197-200 trims all leading zeros then String.to_integer(""));
- dedup scope here is per-file (pointers are file-local line numbers), so
  encode needs only a (file, hash)-partitioned min — no global shuffle wave.

Recovery (#16): the reference resolves each pointer by re-streaming the file
and Enum.fetch-ing position `line` — O(file) per pointer, O(n·m) total
(files.ex:37-43). Set-oriented: ONE equi-join pointers→literals on
(file_id, line). The O(n²) pathology vanishes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sabd_deduplicator_spark.functions.hashing import content_hash
from sabd_deduplicator_spark.operators.chunker import chunks_cte, doc_chunks
from sabd_deduplicator_spark.operators.dedup import build_hash_links
from sabd_deduplicator_spark.registry import query

POINTER_WIDTH = 4  # safe here: documents chunk counts << 10^4; parameterized

LITERAL, POINTER = "0", "1"


def encode_chunks(
    chunks: DataFrame,
    file_col: str = "doc_id",
    algorithm: str = "md5",
    pointer_width: int = POINTER_WIDTH,
) -> DataFrame:
    """chunks(file, line, chunk) → tokens(file, line, token) (#13).

    first_line = min(line) over (file, hash) — an unordered window aggregate:
    one shuffle, no sort (cheaper than row_number for this semantics).
    """
    w = Window.partitionBy(file_col, "hash")
    hashed = chunks.withColumn("hash", content_hash("chunk", algorithm))
    first_line = F.min("line").over(w)
    # Overflow guard: lpad TRUNCATES a too-wide line number to its leftmost
    # digits, encoding a pointer to the WRONG line — recover() would then
    # return same-length wrong bytes with no error (the reference's silent
    # hazard at binary_utils.ex:42-45, width hardcoded to 4). Byte-exact
    # recovery is the core safety property, so fail loudly at encode time
    # instead. CASE WHEN is lazily evaluated per row, so the error fires
    # only when an out-of-range pointer is actually produced.
    limit = 10**pointer_width
    pointer_payload = F.when(
        first_line >= F.lit(limit),
        F.raise_error(
            F.concat(
                F.lit(
                    "pointer overflow: first-occurrence line >= "
                    f"10^{pointer_width}; re-encode with pointer_width >= "
                ),
                F.length(first_line.cast("string")).cast("string"),
                F.lit(" (see required_pointer_width) for file "),
                F.col(file_col).cast("string"),
            )
        ).cast("string"),
    ).otherwise(F.lpad(first_line.cast("string"), pointer_width, "0"))
    token = F.when(
        F.col("line") == first_line, F.concat(F.lit(LITERAL), F.col("chunk"))
    ).otherwise(F.concat(F.lit(POINTER), pointer_payload))
    return hashed.select(file_col, "line", token.alias("token"))


def required_pointer_width(chunks: DataFrame, line_col: str = "line") -> int:
    """Smallest pointer_width whose encoding cannot overflow this corpus:
    the digit count of max(line). One scalar aggregation job (a single-row
    collect — cheap at any scale); use when the chunk count per file is not
    known a priori, e.g. api.deduplicate(pointer_width=None)."""
    max_line = chunks.agg(F.max(line_col)).first()[0]
    if max_line is None:
        return 1
    return max(1, len(str(int(max_line))))


def decode_tokens(
    tokens: DataFrame,
    file_col: str = "doc_id",
    pointer_width: int = POINTER_WIDTH,
) -> DataFrame:
    """tokens(file, line, token) → chunks(file, line, chunk) (#14 + #16).

    Literals keep their payload; pointers equi-join back to the literal at
    (file, pointed line). Broadcast is wrong here (both sides are data-sized);
    a shuffle hash join on (file, line) is the scalable plan and AQE picks it.
    """
    is_literal = F.col("token").startswith(LITERAL)
    literals = tokens.filter(is_literal).select(
        file_col,
        "line",
        F.expr("substring(token, 2)").alias("chunk"),
    )
    # try_cast, not cast: Catalyst may evaluate the projection before the
    # marker filter (collapsed project/filter), and ANSI cast would then
    # throw on literal rows' chunk text.
    pointers = tokens.filter(~is_literal).select(
        file_col,
        "line",
        F.expr(f"try_cast(substring(token, 2, {pointer_width}) AS BIGINT)").alias("ptr"),
    )
    resolved = pointers.alias("p").join(
        literals.alias("l"),
        on=[
            F.col(f"p.{file_col}") == F.col(f"l.{file_col}"),
            F.col("p.ptr") == F.col("l.line"),
        ],
        how="inner",
    ).select(
        F.col(f"p.{file_col}").alias(file_col),
        F.col("p.line").alias("line"),
        F.col("l.chunk").alias("chunk"),
    )
    return literals.unionByName(resolved)


def validate_tokens(
    tokens: DataFrame,
    file_col: str = "doc_id",
    pointer_width: int = POINTER_WIDTH,
) -> DataFrame:
    """Malformed-stream detection (the reference's `:not_chunk` error,
    /root/reference/lib/deduplicator.ex:209-215, plus cases it can't see):
    returns one row per invalid token — empty result = valid stream.

    Violations detected set-at-a-time:
      bad_marker        token starts with neither '0' nor '1'
      bad_pointer       pointer payload is not an integer of the right width
      dangling_pointer  pointer's target line has no literal (incl. the
                        reference's pointer→pointer case)
    """
    is_literal = F.col("token").startswith(LITERAL)
    is_pointer = F.col("token").startswith(POINTER)
    marker_bad = tokens.filter(~is_literal & ~is_pointer).select(
        file_col, "line", "token", F.lit("bad_marker").alias("violation")
    )
    # try_cast: ANSI mode (Spark 4 default) makes a plain cast THROW on
    # malformed input — the validator must classify, not crash.
    ptr_payload = F.expr("try_cast(substring(token, 2) AS BIGINT)")
    pointer_bad = tokens.filter(is_pointer).filter(
        (F.length("token") != pointer_width + 1) | ptr_payload.isNull()
    ).select(file_col, "line", "token", F.lit("bad_pointer").alias("violation"))
    literals = tokens.filter(is_literal).select(
        F.col(file_col).alias("_f"), F.col("line").alias("_l")
    )
    dangling = (
        tokens.filter(is_pointer)
        .withColumn(
            "ptr",
            F.expr(f"try_cast(substring(token, 2, {pointer_width}) AS BIGINT)"),
        )
        .filter(F.col("ptr").isNotNull())  # structurally-bad ones are bad_pointer
        .join(
            literals,
            on=[F.col(file_col) == F.col("_f"), F.col("ptr") == F.col("_l")],
            how="left_anti",
        )
        .select(file_col, "line", "token", F.lit("dangling_pointer").alias("violation"))
    )
    return marker_bad.unionByName(pointer_bad).unionByName(dangling)


# --- global (cross-file) encode ---------------------------------------------

FILE_WIDTH = 6  # digits for the file id in a global pointer


def required_file_width(chunks: DataFrame, file_col: str = "doc_id") -> int:
    """Smallest file_width whose global encoding cannot overflow this corpus:
    the digit count of max(file id). Same one-scalar-aggregation shape as
    required_pointer_width — cheap at any scale. Use file_width=None in
    encode_chunks_global to apply it automatically (a >10^6-file corpus no
    longer raises at the default width; round-3 verdict item 2)."""
    max_file = chunks.agg(F.max(file_col)).first()[0]
    if max_file is None:
        return 1
    return max(1, len(str(int(max_file))))


def encode_chunks_global(
    chunks: DataFrame,
    file_col: str = "doc_id",
    algorithm: str = "md5",
    file_width: int | None = FILE_WIDTH,
    pointer_width: int | None = POINTER_WIDTH,
) -> DataFrame:
    """Cross-file dedup encode: the reference's index is GLOBAL (one
    hash_links table across all files, hash.ex:50-54), so a repeat in any
    file can point at the first occurrence corpus-wide:

        '0' || chunk                                   first global occurrence
        '1' || lpad(file, FW, '0') || lpad(line, W, '0')   repeat anywhere

    Plan: ONE hash aggregate builds the global first-occurrence index
    (build_hash_links — packed-long min keeps it a map-side-combining
    HashAggregate), then one equi-join on hash stamps every chunk with its
    hash's first (file, line). A hot hash (highly duplicated content) makes
    the join skewed on that key — AQE skew-join splitting is the defense
    (the aggregate side is immune: partial agg collapses map-side).
    Overflow of either width raises (same contract as encode_chunks); pass
    file_width=None / pointer_width=None to auto-size each dimension from
    the corpus (required_file_width / required_pointer_width)."""
    if file_width is None:
        file_width = required_file_width(chunks, file_col=file_col)
    if pointer_width is None:
        pointer_width = required_pointer_width(chunks)
    hashed = chunks.withColumn("hash", content_hash("chunk", algorithm))
    links = build_hash_links(
        chunks, file_col=file_col, algorithm=algorithm
    ).select(
        "hash", F.col(file_col).alias("_ff"), F.col("line").alias("_fl")
    )
    joined = hashed.join(links, "hash")
    flimit, llimit = 10**file_width, 10**pointer_width

    def digits(col: str, width: int, limit: int) -> F.Column:
        return F.when(
            F.col(col) >= F.lit(limit),
            F.raise_error(
                F.lit(
                    f"global pointer overflow: {col} >= 10^{width}; "
                    "re-encode with larger widths"
                )
            ).cast("string"),
        ).otherwise(F.lpad(F.col(col).cast("string"), width, "0"))

    token = F.when(
        (F.col(file_col) == F.col("_ff")) & (F.col("line") == F.col("_fl")),
        F.concat(F.lit(LITERAL), F.col("chunk")),
    ).otherwise(
        F.concat(
            F.lit(POINTER),
            digits("_ff", file_width, flimit),
            digits("_fl", pointer_width, llimit),
        )
    )
    return joined.select(file_col, "line", token.alias("token"))


def _infer_global_widths(
    tokens: DataFrame,
    file_col: str,
    file_width: int | None,
    pointer_width: int | None,
) -> tuple[int, int]:
    """Recompute the widths an auto-sized encode_chunks_global chose.

    Valid because tokens carry the SAME (file, line) universe the encoder
    sized from (one token per chunk): required_file_width /
    required_pointer_width over the token stream reproduce the encode-time
    choice exactly. Only meaningful for streams encoded with width=None —
    for fixed-width streams pass the widths you encoded with."""
    if file_width is None:
        file_width = required_file_width(tokens, file_col=file_col)
    if pointer_width is None:
        pointer_width = required_pointer_width(tokens)
    return file_width, pointer_width


def decode_tokens_global(
    tokens: DataFrame,
    file_col: str = "doc_id",
    file_width: int | None = FILE_WIDTH,
    pointer_width: int | None = POINTER_WIDTH,
) -> DataFrame:
    """Inverse of encode_chunks_global: pointers resolve ACROSS files — one
    equi-join on the (file, line) pair of the pointed-at literal.

    file_width/pointer_width accept None to mirror encode_chunks_global's
    auto-sizing (ADVICE r4: auto-sizing was one-sided — tokens encoded with
    None previously decoded to garbage unless the caller independently
    recomputed the widths)."""
    file_width, pointer_width = _infer_global_widths(
        tokens, file_col, file_width, pointer_width
    )
    is_literal = F.col("token").startswith(LITERAL)
    literals = tokens.filter(is_literal).select(
        file_col, "line", F.expr("substring(token, 2)").alias("chunk")
    )
    # try_cast for the same projection-reorder reason as decode_tokens
    pointers = tokens.filter(~is_literal).select(
        file_col,
        "line",
        F.expr(f"try_cast(substring(token, 2, {file_width}) AS BIGINT)").alias("pf"),
        F.expr(
            f"try_cast(substring(token, {2 + file_width}, {pointer_width}) AS BIGINT)"
        ).alias("pl"),
    )
    resolved = pointers.alias("p").join(
        literals.alias("l"),
        on=[
            F.col("p.pf") == F.col(f"l.{file_col}"),
            F.col("p.pl") == F.col("l.line"),
        ],
        how="inner",
    ).select(
        F.col(f"p.{file_col}").alias(file_col),
        F.col("p.line").alias("line"),
        F.col("l.chunk").alias("chunk"),
    )
    return literals.unionByName(resolved)


def validate_tokens_global(
    tokens: DataFrame,
    file_col: str = "doc_id",
    file_width: int | None = FILE_WIDTH,
    pointer_width: int | None = POINTER_WIDTH,
) -> DataFrame:
    """Malformed-stream detection for the GLOBAL grammar (round-3 verdict
    item 3 — validate_tokens covers only per-file pointers). One row per
    invalid token; empty result = valid stream.

      bad_marker        token starts with neither '0' nor '1'
      bad_pointer       payload is not exactly file_width+pointer_width
                        digits, or either fixed-width slice fails an
                        integer parse
      dangling_pointer  the decoded (file, line) target has no literal —
                        including a CROSS-FILE pointer at a file id that
                        does not exist, and pointer→pointer chains

    Same set-at-a-time shape as validate_tokens: marker/width checks are
    narrow scans; the dangling check is one left-anti equi-join against the
    literal set on the decoded (file, line) pair. Widths accept None, same
    contract as decode_tokens_global."""
    file_width, pointer_width = _infer_global_widths(
        tokens, file_col, file_width, pointer_width
    )
    is_literal = F.col("token").startswith(LITERAL)
    is_pointer = F.col("token").startswith(POINTER)
    marker_bad = tokens.filter(~is_literal & ~is_pointer).select(
        file_col, "line", "token", F.lit("bad_marker").alias("violation")
    )
    pf = F.expr(f"try_cast(substring(token, 2, {file_width}) AS BIGINT)")
    pl = F.expr(
        f"try_cast(substring(token, {2 + file_width}, {pointer_width}) AS BIGINT)"
    )
    pointer_bad = (
        tokens.filter(is_pointer)
        .filter(
            (F.length("token") != file_width + pointer_width + 1)
            | pf.isNull()
            | pl.isNull()
        )
        .select(file_col, "line", "token", F.lit("bad_pointer").alias("violation"))
    )
    literals = tokens.filter(is_literal).select(
        F.col(file_col).alias("_f"), F.col("line").alias("_l")
    )
    dangling = (
        tokens.filter(is_pointer)
        .filter(F.length("token") == file_width + pointer_width + 1)
        .withColumn("pf", pf)
        .withColumn("pl", pl)
        .filter(F.col("pf").isNotNull() & F.col("pl").isNotNull())
        .join(
            literals,
            on=[F.col("pf") == F.col("_f"), F.col("pl") == F.col("_l")],
            how="left_anti",
        )
        .select(
            file_col, "line", "token", F.lit("dangling_pointer").alias("violation")
        )
    )
    return marker_bad.unionByName(pointer_bad).unionByName(dangling)


ENCODE_GLOBAL_SQL = (
    "SELECT doc_id, line, CASE WHEN rn = 1 THEN '0' || chunk "
    f"ELSE '1' || lpad(CAST(f_doc AS VARCHAR), {FILE_WIDTH}, '0') "
    f"|| lpad(CAST(f_line AS VARCHAR), {POINTER_WIDTH}, '0') END AS token "
    "FROM (SELECT doc_id, line, chunk, "
    "ROW_NUMBER() OVER w AS rn, "
    "FIRST_VALUE(doc_id) OVER w AS f_doc, "
    "FIRST_VALUE(line) OVER w AS f_line "
    "FROM (" + chunks_cte() + ") "
    "WINDOW w AS (PARTITION BY md5(chunk) ORDER BY doc_id, line))"
)


@query("dedup_encode_global", oracle=ENCODE_GLOBAL_SQL)
def dedup_encode_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return encode_chunks_global(doc_chunks(spark, sf_dir))


@query(
    "roundtrip_recovery_global",
    oracle=f"SELECT doc_id, line, chunk FROM ({chunks_cte()}) c",
)
def roundtrip_recovery_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint: decode splits the token stream into literal and
    # pointer branches — without pinning, the global encode (hash agg +
    # equi-join) executes once per branch.
    tokens = encode_chunks_global(doc_chunks(spark, sf_dir)).localCheckpoint()
    return decode_tokens_global(tokens)


ENCODE_SQL = (
    "SELECT doc_id, line, CASE WHEN line = first_line THEN '0' || chunk "
    f"ELSE '1' || lpad(CAST(first_line AS VARCHAR), {POINTER_WIDTH}, '0') END AS token "
    "FROM (SELECT doc_id, line, chunk, "
    "MIN(line) OVER (PARTITION BY doc_id, md5(chunk)) AS first_line "
    "FROM (" + chunks_cte() + "))"
)


@query("dedup_encode", oracle=ENCODE_SQL)
def dedup_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return encode_chunks(doc_chunks(spark, sf_dir))


@query(
    "roundtrip_recovery",
    # The oracle is the ORIGINAL chunk relation: encode→decode must be the
    # identity (the reference's end-to-end backbone test,
    # test/deduplicator_test.exs:317-321, as a differential check).
    oracle=f"SELECT doc_id, line, chunk FROM ({chunks_cte()}) c",
)
def roundtrip_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint: same two-branch decode shape as the global variant.
    tokens = encode_chunks(doc_chunks(spark, sf_dir)).localCheckpoint()
    return decode_tokens(tokens)


@query(
    "encode_compression_ratio",
    oracle=(
        # Observability the reference only eyeballs (SURVEY.md §5.4):
        # encoded size vs raw size per file, as exact character counts.
        "SELECT doc_id, CAST(sum(length(token)) AS BIGINT) AS encoded_chars, "
        "count(*) AS n_tokens, "
        "CAST(sum(CASE WHEN token LIKE '0%' THEN 1 ELSE 0 END) AS BIGINT) AS n_literals "
        f"FROM ({ENCODE_SQL}) GROUP BY doc_id"
    ),
)
def encode_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = encode_chunks(doc_chunks(spark, sf_dir))
    return tokens.groupBy("doc_id").agg(
        F.sum(F.length("token")).alias("encoded_chars"),
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("token").startswith(LITERAL), 1).otherwise(0))
        .cast("long")
        .alias("n_literals"),
    )
