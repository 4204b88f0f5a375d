"""Frequency / membership sketches with exact-verification audits.

A dedup engine at 100 TB leans on sketches long before it touches exact
state: a Bloom filter in front of the hash-lookup index turns "is this chunk
already stored?" into a broadcast bitmap probe that answers "definitely new"
for the vast majority of chunks without touching the store (the reference's
`get_hashed_links` lookup, /root/reference/lib/deduplicator.ex:84-96, is the
call being guarded); a Count-Min sketch answers "how often does this
token/chunk repeat?" in D×W integers instead of a full frequency table (the
distributed analogue of the reference's repetition-stats query,
/root/reference/lib/deduplicator.ex:120-131).

Both constructions here use md5 slices as the hash family — the package's
standard shared-randomness coin — so the ENTIRE sketch (routing, counters,
estimates, false-positive decisions) is exact integer/string arithmetic that
DuckDB reproduces verbatim: these are fully value-oracled sketch audits, not
rows-only approximations (same discipline that oracle-ized MinHash and the
JL/LSH ANN paths).

Like `minhash_estimate_accuracy`, each query carries its own ground truth:
the sketch answer AND the exact answer are computed side by side, so the
sketch's error is a measured, oracle-checked number. At 100 TB you run the
sketch leg only; the audit legs exist to grade it at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.registry import query

# --- Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) -------------------

CMS_D = 4  # hash rows
CMS_HEX = 3  # bucket key = 3 hex chars → W = 4096 buckets per row


def _cms_keyed(exact: DataFrame) -> DataFrame:
    """(token, n, r, bkt): each distinct token's bucket in every sketch row.
    Bucket routing is a fixed-width md5-hex slice — a string key both
    engines derive identically; no integer conversion needed."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.substring(
                    F.md5(F.concat(F.lit(f"{r}|"), F.col("token"))), 1, CMS_HEX
                ).alias("bkt"),
            )
            for r in range(CMS_D)
        ]
    )
    return exact.select(
        "token", "n", F.explode(pairs).alias("p")
    ).select("token", "n", F.col("p.r").alias("r"), F.col("p.bkt").alias("bkt"))


@query(
    "token_freq_cms_audit",
    oracle=(
        "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents), "
        "ex AS (SELECT token, count(*) AS n FROM tok GROUP BY token), "
        "keyed AS (SELECT token, n, r, "
        f"substr(md5(CAST(r AS VARCHAR) || '|' || token), 1, {CMS_HEX}) AS bkt "
        f"FROM ex, (SELECT unnest(range(0, {CMS_D})) AS r)), "
        "counters AS (SELECT r, bkt, sum(n) AS c FROM keyed GROUP BY r, bkt), "
        "est AS (SELECT k.token, k.n, min(c.c) AS est FROM keyed k "
        "JOIN counters c USING (r, bkt) GROUP BY k.token, k.n) "
        "SELECT count(*) AS n_tokens, CAST(sum(n) AS BIGINT) AS token_mass, "
        "CAST(sum(CASE WHEN est > n THEN 1 ELSE 0 END) AS BIGINT) AS n_over, "
        "CAST(max(est - n) AS BIGINT) AS max_over, "
        "round(avg(est - n), 6) AS mean_over FROM est"
    ),
)
def token_freq_cms_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream, graded against exact
    counts: how many tokens the D×W counter grid over-estimates, by how
    much at worst, and on average. CMS never under-estimates (est ≥ n is
    structural: every counter the min ranges over includes the token's own
    mass), so `n_over`/`max_over` measure pure collision error — the ε·N
    overshoot the Cormode-Muthukrishnan bound prices at W=1/ε buckets.

    Scale shape: one hash aggregate builds exact counts (at 100 TB you'd
    skip it — it exists to grade the sketch); the counter grid is ≤ D·W
    rows and BROADCAST, so sketch estimation is a map-side join over the
    distinct-token relation. Updating the grid on new data is a map-side
    partial sum — the sketch is mergeable across partitions/days by
    construction, which is the whole point at scale."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    exact = tok.groupBy("token").agg(F.count("*").alias("n"))
    keyed = _cms_keyed(exact)
    counters = keyed.groupBy("r", "bkt").agg(F.sum("n").alias("c"))
    est = (
        keyed.join(F.broadcast(counters), ["r", "bkt"])
        .groupBy("token", "n")
        .agg(F.min("c").alias("est"))
    )
    return est.agg(
        F.count("*").alias("n_tokens"),
        F.sum("n").cast("long").alias("token_mass"),
        F.sum(F.when(F.col("est") > F.col("n"), 1).otherwise(0))
        .cast("long")
        .alias("n_over"),
        F.max(F.col("est") - F.col("n")).cast("long").alias("max_over"),
        F.round(F.avg(F.col("est") - F.col("n")), 6).alias("mean_over"),
    )


# --- Bloom filter (Bloom, CACM'70) ------------------------------------------

BLOOM_K = 2  # hash probes per key
BLOOM_HEX = 3  # bit address = 3 hex chars → m = 4096 bits


def _bit_keys(df: DataFrame, key_col: str = "key") -> DataFrame:
    """(key, bit): the BLOOM_K bit addresses of each key."""
    bits = F.array(
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"{j}|"), F.col(key_col))), 1, BLOOM_HEX
            )
            for j in range(BLOOM_K)
        ]
    )
    return df.select(key_col, F.explode(bits).alias("bit"))


@query(
    "dedup_bloom_prefilter",
    oracle=(
        "WITH build AS (SELECT DISTINCT md5(text) AS key FROM documents "
        "  WHERE doc_id % 2 = 0 AND text IS NOT NULL), "
        "probe AS (SELECT DISTINCT md5(text) AS key FROM documents "
        "  WHERE doc_id % 2 <> 0 AND text IS NOT NULL), "
        "bits AS (SELECT DISTINCT "
        f"substr(md5(CAST(j AS VARCHAR) || '|' || key), 1, {BLOOM_HEX}) AS bit "
        f"FROM build, (SELECT unnest(range(0, {BLOOM_K})) AS j)), "
        "pk AS (SELECT key, "
        f"substr(md5(CAST(j AS VARCHAR) || '|' || key), 1, {BLOOM_HEX}) AS bit "
        f"FROM probe, (SELECT unnest(range(0, {BLOOM_K})) AS j)), "
        "hits AS (SELECT key, count(*) AS nb FROM pk "
        "  WHERE EXISTS (SELECT 1 FROM bits b WHERE b.bit = pk.bit) GROUP BY key), "
        "flags AS (SELECT p.key, "
        f"  coalesce(h.nb, 0) = {BLOOM_K} AS bpos, "
        "  EXISTS (SELECT 1 FROM build b WHERE b.key = p.key) AS isdup "
        "  FROM probe p LEFT JOIN hits h USING (key)) "
        "SELECT (SELECT count(*) FROM build) AS n_build, "
        "count(*) AS n_probe, "
        "CAST(sum(CASE WHEN bpos THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pos, "
        "CAST(sum(CASE WHEN isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dup, "
        "CAST(sum(CASE WHEN bpos AND NOT isdup THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos, "
        "round(CAST(sum(CASE WHEN bpos AND NOT isdup THEN 1 ELSE 0 END) AS DOUBLE) "
        " / nullif(count(*) - sum(CASE WHEN isdup THEN 1 ELSE 0 END), 0), 6) AS fpr "
        "FROM flags"
    ),
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup prefilter, graded exactly: build an m=16^BLOOM_HEX
    bit filter over half the corpus's content hashes (doc_id parity split),
    probe the other half, and measure the false-positive rate against the
    exact semi-join. In the production posture only bloom-POSITIVE keys pay
    the exact index lookup (the reference's get_hashed_links probe,
    deduplicator.ex:84-96); everything the filter rejects skips the store
    entirely, and the measured `fpr` is the fraction of wasted lookups.

    Scale shape: the filter materializes as ≤ m DISTINCT set bit addresses
    — broadcast to every executor (a real deployment ships the bitmap
    itself; the relational encoding keeps it oracle-checkable) — so
    probing is a map-side broadcast join + one count-equals-K aggregate.
    The exact membership join exists only to grade the filter; n_build /
    n_probe / fpr let you re-derive the (1 - e^{-kn/m})^k load curve."""
    docs = table(spark, sf_dir, "documents")

    def half(pred) -> DataFrame:
        return (
            docs.filter(pred & F.col("text").isNotNull())
            .select(F.md5("text").alias("key"))
            .distinct()
        )

    build = half(F.col("doc_id") % 2 == 0)
    probe = half(F.col("doc_id") % 2 != 0)
    bits = _bit_keys(build).select("bit").distinct()
    hits = (
        _bit_keys(probe)
        .join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("nb"))
    )
    flags = (
        probe.join(hits, "key", "left")
        .withColumn("bpos", F.coalesce(F.col("nb"), F.lit(0)) == BLOOM_K)
        .join(build.withColumn("isdup_", F.lit(True)), "key", "left")
        .withColumn("isdup", F.coalesce(F.col("isdup_"), F.lit(False)))
    )
    n_build = build.agg(F.count("*").alias("n_build"))
    return n_build.crossJoin(
        flags.agg(
            F.count("*").alias("n_probe"),
            F.sum(F.when(F.col("bpos"), 1).otherwise(0))
            .cast("long")
            .alias("n_bloom_pos"),
            F.sum(F.when(F.col("isdup"), 1).otherwise(0))
            .cast("long")
            .alias("n_true_dup"),
            F.sum(F.when(F.col("bpos") & ~F.col("isdup"), 1).otherwise(0))
            .cast("long")
            .alias("n_false_pos"),
            F.round(
                F.sum(F.when(F.col("bpos") & ~F.col("isdup"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.nullif(
                    F.count("*")
                    - F.sum(F.when(F.col("isdup"), 1).otherwise(0)).cast("long"),
                    F.lit(0),
                ),
                6,
            ).alias("fpr"),
        )
    ).select(
        F.col("n_build").cast("long").alias("n_build"),
        "n_probe",
        "n_bloom_pos",
        "n_true_dup",
        "n_false_pos",
        "fpr",
    )


# --- feature hashing (Weinberger et al., ICML'09) ---------------------------

FH_DIMS = 16  # one dimension per md5 hex nibble


@query(
    "doc_feature_hash_vector",
    oracle=(
        "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
        "FROM documents) "
        "SELECT doc_id, "
        + ", ".join(
            "CAST(sum(CASE WHEN strpos('0123456789abcdef', "
            f"substr(md5('fh|' || token), 1, 1)) - 1 = {j} THEN "
            "(CASE WHEN substr(md5('fs|' || token), 1, 1) < '8' THEN 1 ELSE -1 END) "
            f"ELSE 0 END) AS BIGINT) AS v{j}"
            for j in range(FH_DIMS)
        )
        + " FROM tok GROUP BY doc_id"
    ),
)
def doc_feature_hash_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: a FH_DIMS-dimensional signed-count vector per
    document with NO trained model and NO vocabulary table — dimension =
    first md5 nibble of the token, sign = the package's standard md5 coin.
    Signed hashing makes collisions cancel in expectation (Weinberger
    ICML'09), so dot products approximate token-overlap kernels; this is
    the text→vector path when no embedding model is in the loop, and its
    output plugs straight into the embedding family's near-dup/kNN
    operators. All-integer arithmetic end to end — fully value-oracled,
    unlike any learned embedding.

    Scale shape: explode (codegen) → ONE hash aggregate with FH_DIMS
    conditional integer sums — map-side partials collapse per doc, no
    vocabulary join, no model broadcast; the vector table is exactly one
    narrow row per doc."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dim = F.conv(F.substring(F.md5(F.concat(F.lit("fh|"), F.col("token"))), 1, 1), 16, 10).cast("int")
    sign = F.when(
        F.substring(F.md5(F.concat(F.lit("fs|"), F.col("token"))), 1, 1) < "8", 1
    ).otherwise(-1)
    return tok.select("doc_id", dim.alias("d"), sign.alias("s")).groupBy(
        "doc_id"
    ).agg(
        *[
            F.sum(F.when(F.col("d") == j, F.col("s")).otherwise(0))
            .cast("long")
            .alias(f"v{j}")
            for j in range(FH_DIMS)
        ]
    )


# --- Bloom size sweep: FPR vs m from ONE bit-address computation ------------

BLOOM_SWEEP_HEX = (2, 3, 4)  # m = 256 / 4096 / 65536 bits


@query(
    "dedup_bloom_sweep",
    oracle=(
        "WITH build AS (SELECT DISTINCT md5(text) AS key FROM documents "
        "  WHERE doc_id % 2 = 0 AND text IS NOT NULL), "
        "probe AS (SELECT DISTINCT md5(text) AS key FROM documents "
        "  WHERE doc_id % 2 <> 0 AND text IS NOT NULL), "
        "widths AS (SELECT unnest([2, 3, 4]) AS w), "
        "bb AS (SELECT key, "
        "  substr(md5(CAST(j AS VARCHAR) || '|' || key), 1, 4) AS bit4 "
        f"  FROM build, (SELECT unnest(range(0, {BLOOM_K})) AS j)), "
        "pb AS (SELECT key, j, "
        "  substr(md5(CAST(j AS VARCHAR) || '|' || key), 1, 4) AS bit4 "
        f"  FROM probe, (SELECT unnest(range(0, {BLOOM_K})) AS j)), "
        "bits AS (SELECT w, substr(bit4, 1, CAST(w AS INT)) AS bit "
        "  FROM bb, widths GROUP BY 1, 2), "
        "hits AS (SELECT p.w, p.key, count(*) AS nb FROM ("
        "    SELECT key, j, w, substr(bit4, 1, CAST(w AS INT)) AS bit "
        "    FROM pb, widths) p "
        "  WHERE EXISTS (SELECT 1 FROM bits b WHERE b.w = p.w AND b.bit = p.bit) "
        "  GROUP BY p.w, p.key), "
        "dup AS (SELECT count(*) AS n_dup FROM probe p "
        "  WHERE EXISTS (SELECT 1 FROM build b WHERE b.key = p.key)), "
        "np AS (SELECT count(*) AS n_probe FROM probe) "
        "SELECT CAST(w AS INT) AS hex_width, "
        "CAST(power(16, w) AS BIGINT) AS m_bits, "
        "(SELECT CAST(count(*) AS BIGINT) FROM bits b WHERE b.w = widths.w) AS n_bits_set, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM hits h WHERE h.w = widths.w AND h.nb = {BLOOM_K}) AS n_bloom_pos, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM hits h WHERE h.w = widths.w AND h.nb = {BLOOM_K}) "
        "  - (SELECT n_dup FROM dup) AS n_false_pos, "
        f"round(CAST((SELECT count(*) FROM hits h WHERE h.w = widths.w AND h.nb = {BLOOM_K}) "
        "  - (SELECT n_dup FROM dup) AS DOUBLE) "
        "  / nullif((SELECT n_probe FROM np) - (SELECT n_dup FROM dup), 0), 6) AS fpr "
        "FROM widths"
    ),
)
def dedup_bloom_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-sizing curve: the measured false-positive rate of the SAME
    Bloom construction at m = 256 / 4096 / 65536 bits, from ONE bit-address
    computation — a w-hex-char bit address is the PREFIX of the 4-hex one,
    so every sweep point reuses the widest addresses (the nested-prefix
    trick the ANN probe sweeps use). Every bloom-positive is a true
    duplicate or a false positive, so n_false_pos = n_bloom_pos - n_dup
    without classifying individual keys. This is how you size the
    ingest-prefilter from measurement instead of the (1-e^{-kn/m})^k
    formula — and the oracle checks the measurement.

    Scale shape: one explode of BLOOM_K×3 prefix rows per distinct key,
    one distinct per width (bit sets ≤ m rows each, broadcast), one
    count-equals-K aggregate per width; the exact-dup scalar is a single
    semi-join count shared by all widths."""
    docs = table(spark, sf_dir, "documents")

    def half(pred) -> DataFrame:
        return (
            docs.filter(pred & F.col("text").isNotNull())
            .select(F.md5("text").alias("key"))
            .distinct()
        )

    build = half(F.col("doc_id") % 2 == 0)
    probe = half(F.col("doc_id") % 2 != 0)

    def bit4(df: DataFrame) -> DataFrame:
        arr = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.substring(
                        F.md5(F.concat(F.lit(f"{j}|"), F.col("key"))), 1, 4
                    ).alias("bit4"),
                )
                for j in range(BLOOM_K)
            ]
        )
        cols = ["key", F.col("p.j").alias("j"), F.col("p.bit4").alias("bit4")]
        return df.select("key", F.explode(arr).alias("p")).select(*cols)

    legs = []
    n_dup = probe.join(build, "key", "left_semi").agg(
        F.count("*").alias("n_dup")
    )
    n_probe = probe.agg(F.count("*").alias("n_probe"))
    for w in BLOOM_SWEEP_HEX:
        bits = (
            bit4(build)
            .select(F.substring("bit4", 1, w).alias("bit"))
            .distinct()
        )
        pos = (
            bit4(probe)
            .select("key", F.substring("bit4", 1, w).alias("bit"))
            .join(F.broadcast(bits), "bit", "left_semi")
            .groupBy("key")
            .agg(F.count("*").alias("nb"))
            .filter(F.col("nb") == BLOOM_K)
            .agg(F.count("*").alias("n_bloom_pos"))
        )
        legs.append(
            bits.agg(F.count("*").alias("n_bits_set"))
            .crossJoin(pos)
            .crossJoin(n_dup)
            .crossJoin(n_probe)
            .select(
                F.lit(w).cast("int").alias("hex_width"),
                F.lit(16**w).cast("long").alias("m_bits"),
                F.col("n_bits_set").cast("long").alias("n_bits_set"),
                F.col("n_bloom_pos").cast("long").alias("n_bloom_pos"),
                (F.col("n_bloom_pos") - F.col("n_dup"))
                .cast("long")
                .alias("n_false_pos"),
                F.round(
                    (F.col("n_bloom_pos") - F.col("n_dup")).cast("double")
                    / F.nullif(F.col("n_probe") - F.col("n_dup"), F.lit(0)),
                    6,
                ).alias("fpr"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
