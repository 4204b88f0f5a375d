"""The dedup operator family (SURVEY.md §2.A #7, #8, #18 — the core of the
reference).

Reference behavior: for each chunk, if its hash is unseen, record
(hash → file, line) in the index; else bump refs_num
(/root/reference/lib/deduplicator.ex:84-119,
/root/reference/lib/deduplicator/hash.ex:50-54,81-103). The reference does
this one chunk at a time with a Postgres probe per unseen chunk (N+1
pathology, SURVEY.md §4); set-oriented Spark collapses the whole fold into ONE
hash-partitioned aggregation:

    groupBy(hash).agg(min(struct(file_id, line)), count(*))

- single shuffle on `hash`; partial (map-side) aggregation comes free from
  Catalyst, which is exactly the reference's "in-flight batch dedup"
  optimization (deduplicator.ex:88-92) done properly;
- `min(struct(...))` is a lexicographic min, giving the first occurrence under
  the explicit (file_id, line) order without a window sort;
- refs_num is recomputed from base data rather than point-updated
  (hash.ex:94-102's per-row UPDATE loop has no scalable analog — immutable
  recompute is the Spark-native answer).

Skew note for 100 TB: highly duplicated corpora make a few hash keys huge.
Partial aggregation already collapses duplicates map-side (a key with 10^9
occurrences arrives at the reducer as ~num_partitions partial rows), so this
aggregation — unlike a window over `hash` — does NOT need salting. AQE
skew-join handling covers the join-back variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sabd_deduplicator_spark import catalog
from sabd_deduplicator_spark.functions.hashing import content_hash
from sabd_deduplicator_spark.operators.chunker import chunks_cte, doc_chunks
from sabd_deduplicator_spark.registry import query


def first_occurrence(df: DataFrame, hash_col: str = "hash", *order_cols: str) -> DataFrame:
    """Keep exactly the first row per hash under an explicit total order
    (reference semantics: smallest stream position wins, deduplicator.ex:84-119).

    Implemented as a window row_number; for first-row-only semantics with no
    other columns needed, prefer :func:`build_hash_links` (agg, cheaper).
    """
    if not order_cols:
        raise ValueError("explicit order columns are required (no implicit row order)")
    w = Window.partitionBy(hash_col).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


# Lines-per-file bound for the packed (file_id, line) ordinal. 2^24 = 16M
# chunks per file; file_id then ranges to 2^38 — both far beyond any input
# here (the reference's pointer grammar caps at 10^4 lines, SURVEY.md §4
# hazard 2). Packing matters because min(struct(...)) falls back to a
# SortAggregate, while min(long) stays a HashAggregate with map-side combine.
_LINE_BITS = 24
_FILE_BITS = 38


def _packed_ordinal(file_col: str, line_col: str) -> F.Column:
    """(file_id, line) packed into one long, lexicographic under plain min.
    Out-of-range ids would silently pack into a WRONG ordinal (line bleeding
    into file bits), so the expression raises instead — a per-row comparison
    against two constants, negligible next to the md5 beside it, and CASE
    WHEN keeps the aggregate a codegen'd HashAggregate."""
    line = F.col(line_col).cast("long")
    fid = F.col(file_col).cast("long")
    bad = (
        (line < 0)
        | (line >= F.lit(1 << _LINE_BITS))
        | (fid < 0)
        | (fid >= F.lit(1 << _FILE_BITS))
    )
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    "packed ordinal out of range: need 0 <= line < "
                    f"2^{_LINE_BITS} and 0 <= file_id < 2^{_FILE_BITS}, got "
                    "line="
                ),
                line.cast("string"),
                F.lit(" file_id="),
                fid.cast("string"),
            )
        ).cast("long"),
    ).otherwise(fid * (1 << _LINE_BITS) + line)


def build_hash_links(
    chunks: DataFrame,
    chunk_col: str = "chunk",
    file_col: str = "file_id",
    line_col: str = "line",
    algorithm: str = "md5",
) -> DataFrame:
    """chunks(file_id, line, chunk) → hash_links(hash, file_id, line, refs_num).

    One shuffle (by hash), hash aggregate with map-side partial agg, no
    window sort: the first occurrence is min(file_id << 24 | line), a plain
    long min (lexicographic on the packed pair).
    """
    packed = _packed_ordinal(file_col, line_col)
    hashed = chunks.withColumn("hash", content_hash(chunk_col, algorithm))
    return hashed.groupBy("hash").agg(
        F.min(packed).alias("_first"),
        F.count("*").alias("refs_num"),
    ).select(
        "hash",
        F.expr(f"shiftright(_first, {_LINE_BITS})").alias(file_col),
        F.expr(f"_first & {(1 << _LINE_BITS) - 1}").alias(line_col),
        "refs_num",
    )


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact-duplicate removal keeping an arbitrary representative —
    the `dropDuplicates` shortcut (valid when order doesn't matter)."""
    return df.dropDuplicates(cols)


def merge_hash_links(existing: DataFrame, new_chunks: DataFrame, **kw) -> DataFrame:
    """Incremental index maintenance: fold a new batch of chunks into an
    existing hash_links index — the set-oriented version of the reference's
    per-flush insert_all + refs_num UPDATE loop
    (/root/reference/lib/deduplicator/hash.ex:66-79,94-102).

    Semantics: refs_num adds up; the first occurrence keeps the OLD link if
    the hash was known (the reference never relocates a link), else the new
    batch's min. One union + one hash aggregate; idempotence is the caller's
    concern (exactly-once ingest or foreachBatch).
    """
    new_links = build_hash_links(new_chunks, **kw)
    both = existing.select("hash", "file_id", "line", "refs_num").withColumn(
        "_src", F.lit(0)
    ).unionByName(new_links.withColumn("_src", F.lit(1)))
    packed = (
        F.col("_src").cast("long") * (1 << (_LINE_BITS + _FILE_BITS))
        + _packed_ordinal("file_id", "line")
    )
    return both.groupBy("hash").agg(
        F.min(packed).alias("_first"),
        F.sum("refs_num").alias("refs_num"),
    ).select(
        "hash",
        F.expr(f"shiftright(_first, {_LINE_BITS}) & {(1 << _FILE_BITS) - 1}").alias("file_id"),
        F.expr(f"_first & {(1 << _LINE_BITS) - 1}").alias("line"),
        "refs_num",
    )


def unmerge_hash_links(
    existing: DataFrame,
    deleted_chunks: DataFrame,
    kept_chunks: DataFrame,
    chunk_col: str = "chunk",
    file_col: str = "file_id",
    line_col: str = "line",
    algorithm: str = "md5",
) -> DataFrame:
    """Incremental DELETE maintenance — the right-to-be-forgotten inverse of
    merge_hash_links: remove a batch of documents' chunks from a hash_links
    index WITHOUT rebuilding it. The reference's Postgres model has no
    delete path at all (lib/deduplicator/hash.ex only inserts and
    increments); at 100 TB a GDPR erasure cannot afford a corpus rebuild,
    so the maintenance must be delta-sized.

    Semantics (provably equal to a from-scratch rebuild over the surviving
    corpus — the registered dedup_forget_docs query's oracle IS that
    rebuild):
    - refs_num decreases by the hash's deleted-occurrence count; rows
      reaching zero are dropped;
    - a surviving hash whose stored FIRST occurrence lived in a deleted
      document is REASSIGNED to the minimum surviving (file, line) —
      min of the packed ordinal, the same plain-long HashAggregate as the
      build; stored pointers owned by surviving documents are untouched
      (the stored pointer is the global min, so it remains the min of any
      superset of survivors that contains it).

    Cost shape: one delta-sized aggregate (deleted occurrences per hash),
    one broadcast of the deleted FILE ids against the index, and a rescan
    of the surviving occurrence log RESTRICTED to the affected hashes by
    an equi-join (kept_chunks is only read where a reassignment is needed
    — with a bucketed chunk log the probe is co-located). Never O(corpus).
    """
    del_hashed = deleted_chunks.withColumn(
        "hash", content_hash(chunk_col, algorithm)
    )
    dec = del_hashed.groupBy("hash").agg(F.count("*").alias("_dec"))
    deleted_files = deleted_chunks.select(
        F.col(file_col).alias("_delf")
    ).distinct()
    j = (
        existing.join(dec, "hash", "left")
        .withColumn("_dec", F.coalesce("_dec", F.lit(0)))
        .filter(F.col("refs_num") > F.col("_dec"))
    )
    marked = j.join(
        F.broadcast(deleted_files),
        F.col(file_col) == F.col("_delf"),
        "left",
    )
    survivors_refs = (F.col("refs_num") - F.col("_dec")).alias("refs_num")
    keep_ptr = marked.filter(F.col("_delf").isNull()).select(
        "hash", file_col, line_col, survivors_refs
    )
    need = marked.filter(F.col("_delf").isNotNull()).select(
        "hash", survivors_refs
    )
    kept_hashed = kept_chunks.withColumn(
        "hash", content_hash(chunk_col, algorithm)
    )
    new_ptr = (
        kept_hashed.join(need.select("hash"), "hash", "left_semi")
        .groupBy("hash")
        .agg(F.min(_packed_ordinal(file_col, line_col)).alias("_first"))
    )
    reassigned = need.join(new_ptr, "hash").select(
        "hash",
        F.expr(f"shiftright(_first, {_LINE_BITS})").alias(file_col),
        F.expr(f"_first & {(1 << _LINE_BITS) - 1}").alias(line_col),
        "refs_num",
    )
    return keep_ptr.unionByName(reassigned)


def merge_hash_links_onto_index(
    existing: DataFrame, new_links: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """Join-based twin of merge_hash_links for an ON-DISK BUCKETED index
    (save_bucketed_table on `hash`). The reference probes its Postgres
    B-tree index per flush (/root/reference/lib/deduplicator/hash.ex:66-79);
    the Spark analogue that survives a 100× index is: keep the (huge) index
    in place and move only the (small) delta. A full-outer join on the
    bucket key reads the index side shuffle-free straight from its buckets
    and Exchanges ONLY the new batch into the index's partitioning — gated
    as exactly-one-Exchange in tests/test_bucketed_join.py.

    The delta is first collapsed to one row per hash (min packed link, refs
    summed) so a batch that repeats a hash cannot fan out the full-outer
    join and break the one-row-per-hash index invariant. Pass ``n_buckets``
    equal to the index's bucket count to keep the whole plan at ONE
    Exchange: the delta is repartitioned straight into the index's
    partitioning, and both the aggregate and the join then run
    exchange-free on top of it. Without it the plan is still correct but
    pays a second (delta-sized — i.e. cheap) shuffle.

    Semantics match merge_hash_links under the index invariant (one row per
    hash): a known hash keeps its OLD link and adds the new refs; a new
    hash takes the batch's min link. Prefer this form whenever `existing`
    is a bucketed/partitioned stored table; the union+agg form is for two
    in-flight DataFrames neither of which has a useful layout."""
    e = existing.select("hash", "file_id", "line", "refs_num")
    raw = new_links.select("hash", "file_id", "line", "refs_num")
    if n_buckets is not None:
        raw = raw.repartition(n_buckets, "hash")
    n = raw.groupBy("hash").agg(
        F.min(_packed_ordinal("file_id", "line")).alias("_np"),
        F.sum("refs_num").alias("_nr"),
    ).select(
        "hash",
        F.expr(f"shiftright(_np, {_LINE_BITS})").alias("_nf"),
        F.expr(f"_np & {(1 << _LINE_BITS) - 1}").alias("_nl"),
        "_nr",
    )
    return e.join(n, "hash", "full_outer").select(
        "hash",
        F.coalesce("file_id", "_nf").alias("file_id"),
        F.coalesce("line", "_nl").alias("line"),
        (F.coalesce("refs_num", F.lit(0)) + F.coalesce("_nr", F.lit(0))).alias(
            "refs_num"
        ),
    )


# ---------------------------------------------------------------------------
# Registered queries (documents.text as the content being deduplicated)
# ---------------------------------------------------------------------------


@query(
    "dedup_first_occurrence",
    oracle=(
        "SELECT doc_id, hash FROM ("
        "  SELECT doc_id, md5(text) AS hash,"
        "         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn"
        "  FROM documents"
        ") WHERE rn = 1"
    ),
)
def dedup_first_occurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence exact dedup of whole documents (#7): the survivor per
    content hash is the lowest doc_id."""
    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", content_hash("text").alias("hash")
    )
    return first_occurrence(docs, "hash", "doc_id").select("doc_id", "hash")


@query(
    "dedup_refcount",
    oracle="SELECT md5(text) AS hash, count(*) AS refs_num FROM documents GROUP BY md5(text)",
)
def dedup_refcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference counting (#8): hash.ex:81-89's group-then-increment becomes a
    plain hash aggregate with automatic partial+final stages."""
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.groupBy(content_hash("text").alias("hash")).agg(
        F.count("*").alias("refs_num")
    )


@query(
    "dedup_repetition_stats",
    oracle=(
        "SELECT hash, refs_num FROM ("
        "  SELECT md5(chunk) AS hash, count(*) AS refs_num FROM ("
        + chunks_cte()
        + ") GROUP BY md5(chunk)"
        ") WHERE refs_num > 1 ORDER BY refs_num DESC"
    ),
)
def dedup_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-stats report (#18, test/deduplicator_test.exs:323-330):
    hashes occurring more than once, most-repeated first."""
    chunks = doc_chunks(spark, sf_dir)
    counts = chunks.groupBy(content_hash("chunk").alias("hash")).agg(
        F.count("*").alias("refs_num")
    )
    return counts.filter(F.col("refs_num") > 1).orderBy(F.desc("refs_num"))


@query(
    "dedup_hash_links",
    oracle=(
        "SELECT hash, file_id, line, refs_num FROM ("
        "  SELECT md5(chunk) AS hash, doc_id AS file_id, line,"
        "         ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, line) AS rn,"
        "         COUNT(*) OVER (PARTITION BY md5(chunk)) AS refs_num"
        "  FROM (" + chunks_cte() + ")"
        ") WHERE rn = 1"
    ),
)
def dedup_hash_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE core operator: build the hash_links index over chunked documents —
    hash PK, (file, line) of first occurrence, refs_num (FIXTURES.md §A.4)."""
    chunks = doc_chunks(spark, sf_dir).withColumnRenamed("doc_id", "file_id")
    return build_hash_links(chunks)


@query(
    "dedup_invariants",
    oracle=(
        # sum(refs_num) == total chunks; one row per distinct hash
        # (FIXTURES.md §A.4 invariants).
        "SELECT CAST(sum(refs_num) AS BIGINT) AS total_refs,"
        "       count(*) AS n_hashes,"
        "       count(DISTINCT hash) AS n_distinct FROM ("
        "  SELECT md5(chunk) AS hash, count(*) AS refs_num"
        "  FROM (" + chunks_cte() + ") GROUP BY md5(chunk))"
    ),
)
def dedup_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = dedup_hash_links(spark, sf_dir)
    return links.agg(
        F.sum("refs_num").alias("total_refs"),
        F.count("*").alias("n_hashes"),
        F.countDistinct("hash").alias("n_distinct"),
    )


FORGET_MOD = 17  # tombstone: doc_id % 17 == 0 (~6% of docs, deterministic)


@query(
    "dedup_forget_docs",
    oracle=(
        # The oracle is the FROM-SCRATCH REBUILD over the surviving corpus:
        # value-hash equality with the Spark side's INCREMENTAL maintenance
        # is the delete-equals-rebuild theorem, checked per row.
        "SELECT hash, file_id, line, refs_num FROM ("
        "  SELECT md5(chunk) AS hash, doc_id AS file_id, line,"
        "         ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, line) AS rn,"
        "         COUNT(*) OVER (PARTITION BY md5(chunk)) AS refs_num"
        "  FROM ("
        + chunks_cte().replace(
            "FROM documents",
            f"FROM documents WHERE NOT coalesce((doc_id % {FORGET_MOD}) = 0, FALSE)",
        )
        + ")"
        ") WHERE rn = 1"
    ),
)
def dedup_forget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten: erase a deterministic tombstone set
    (doc_id % FORGET_MOD == 0) from the hash_links index by INCREMENTAL
    maintenance (unmerge_hash_links) — refcounts decremented, fully-deleted
    hashes dropped, first-occurrence pointers REASSIGNED to the minimum
    surviving occurrence when their owner was erased. The oracle rebuilds
    the index from scratch over the survivors, so parity IS the
    delete-equals-rebuild equivalence theorem (the deletion twin of the
    insert-side merge-vs-rebuild test in tests/test_incremental_index.py).
    The reference cannot do this at all: its Postgres index only inserts
    and increments (lib/deduplicator/hash.ex:47-102); erasing a file means
    re-ingesting everything.

    Work is delta-sized, never O(corpus): deleted occurrences aggregate to
    one delta-shuffle, deleted FILE ids broadcast against the index, and
    the surviving chunk log is consulted only for hashes whose stored
    pointer was erased (equi-join restriction)."""
    chunks = doc_chunks(spark, sf_dir).withColumnRenamed("doc_id", "file_id")
    tomb = F.expr(f"coalesce((file_id % {FORGET_MOD}) = 0, FALSE)")
    existing = build_hash_links(chunks)
    return unmerge_hash_links(
        existing, chunks.filter(tomb), chunks.filter(~tomb)
    )


SNAPSHOT_MOD = 10  # "yesterday" = doc_id % 10 != 9 (deterministic stand-in)


@query(
    "corpus_snapshot_diff",
    oracle=(
        # presence sentinels, NOT `hash IS NULL`: a NULL text hashes to a
        # NULL *value* on a present row, which `p.hash IS NULL` would
        # misread as "no match" (fuzz-parity finding; the Spark side always
        # used lit(1) sentinels)
        "WITH prev AS (SELECT DISTINCT md5(text) AS hash, 1 AS p "
        f"  FROM documents WHERE doc_id % {SNAPSHOT_MOD} <> {SNAPSHOT_MOD - 1}), "
        "cur AS (SELECT DISTINCT md5(text) AS hash, 1 AS c FROM documents) "
        "SELECT CASE WHEN p.p IS NULL THEN 'added' "
        "            WHEN c.c IS NULL THEN 'removed' "
        "            ELSE 'retained' END AS status, "
        "count(*) AS n_hashes "
        "FROM cur c FULL OUTER JOIN prev p ON c.hash = p.hash "
        "GROUP BY 1"
    ),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus diff by CONTENT hash: classify every
    distinct document hash as added / removed / retained between two corpus
    snapshots — the bookkeeping every incremental ingestion run does before
    deciding what to (re)process, and the set-level generalization of the
    reference's "which chunks are new" probe (lib/deduplicator/hash.ex:
    91-93, the IN-list that merge_hash_links/anti_join_new_hashes already
    cover row-level). "Yesterday" is a deterministic doc_id-slice stand-in
    (% 10 != 9) so the query is reproducible and oracle-checkable.

    Scale shape: two distinct-hash sets (hash aggregates with map-side
    partials — duplicated content collapses before the shuffle), one
    full-outer hash join on the hash, and a 3-row classification aggregate.
    At 100 TB both sides would be the stored hash indexes of the two
    snapshots (bucketed on hash — the join is then co-located and
    shuffle-free, the same posture as merge_hash_links_onto_index)."""
    docs = catalog.table(spark, sf_dir, "documents")
    cur = docs.select(F.md5("text").alias("hash")).distinct()
    prev = (
        docs.filter(F.col("doc_id") % SNAPSHOT_MOD != SNAPSHOT_MOD - 1)
        .select(F.md5("text").alias("hash"))
        .distinct()
    )
    joined = cur.withColumn("c", F.lit(1)).join(
        prev.withColumn("p", F.lit(1)), "hash", "full_outer"
    )
    return (
        joined.select(
            F.when(F.col("p").isNull(), F.lit("added"))
            .when(F.col("c").isNull(), F.lit("removed"))
            .otherwise(F.lit("retained"))
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count("*").alias("n_hashes"))
    )
