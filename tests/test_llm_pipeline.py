"""Invariant tests for the corpus-build pipeline operators — properties the
DuckDB oracle parity can't express (cross-query consistency, determinism
under repartitioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark import registry
from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.operators.llm_pipeline import (
    corpus_train_split,
    gopher_repetition_filters,
    sequence_packing_bins,
    span_dedup_corpus,
)
from sabd_deduplicator_spark.operators.text import with_tokens

registry.load_all_queries()


def test_span_dedup_kept_equals_distinct_spans(spark, sf_dir):
    """Corpus-wide invariant: total kept spans == number of DISTINCT spans
    (each distinct span survives exactly once), and no doc keeps more spans
    than it has."""
    res = span_dedup_corpus(spark, sf_dir)
    agg = res.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_spans").alias("total")
    ).first()
    d = with_tokens(table(spark, sf_dir, "documents"))
    spans = F.expr(
        "transform(sequence(0, CAST(ceil(size(tokens) / 8.0) AS INT) - 1), "
        "i -> array_join(slice(tokens, i * 8 + 1, 8), ' '))"
    )
    distinct_spans = (
        d.select(F.explode(spans).alias("span")).select("span").distinct().count()
    )
    assert agg["kept"] == distinct_spans
    assert agg["total"] >= agg["kept"]
    assert res.filter(F.col("n_kept") > F.col("n_spans")).count() == 0


def test_span_dedup_first_doc_keeps_everything(spark, sf_dir):
    """The reference's first-occurrence rule (deduplicator.ex:84-119) lifted
    to spans: the globally smallest doc_id keeps ALL its spans (nothing
    precedes it), so its reassembled text is the original."""
    docs = table(spark, sf_dir, "documents")
    first = docs.orderBy("doc_id").select("doc_id", "text").first()
    row = (
        span_dedup_corpus(spark, sf_dir)
        .filter(F.col("doc_id") == first["doc_id"])
        .first()
    )
    assert row["n_kept"] == row["n_spans"]
    assert row["kept_text"] == first["text"]


def test_train_split_deterministic_under_repartition(spark, sf_dir):
    """The md5-bucket split must not depend on partition layout (the failure
    mode of rand(seed) splits): per-split counts are identical when the input
    is read through a different partitioning."""
    a = {
        (r["split"], r["lang"]): (r["n_docs"], r["n_tokens"])
        for r in corpus_train_split(spark, sf_dir).toLocalIterator()
    }
    docs = table(spark, sf_dir, "documents").repartition(13, "lang")
    docs.createOrReplaceTempView("documents_repart")
    # recompute through the same expressions over the repartitioned data
    from sabd_deduplicator_spark.operators.llm_pipeline import _hex_bucket

    d = with_tokens(docs)
    b = _hex_bucket("doc_id")
    split = F.when(b < 204, "train").when(b < 230, "val").otherwise("test")
    again = {
        (r["split"], r["lang"]): (r["n_docs"], r["n_tokens"])
        for r in d.select(split.alias("split"), "lang", F.size("tokens").cast("long").alias("n_tok"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .toLocalIterator()
    }
    assert a == again
    total = sum(n for n, _ in a.values())
    train = sum(n for (s, _), (n, _) in a.items() if s == "train")
    assert 0.70 <= train / total <= 0.90  # ~80% by construction


def test_packing_bins_conserve_tokens(spark, sf_dir):
    """Packing must conserve token mass: per-lang bin totals sum to the
    per-lang corpus totals, and every bin except the last holds >= 512
    tokens' worth of starts (bin ids are dense from 0)."""
    bins = sequence_packing_bins(spark, sf_dir)
    per_lang = {
        r["lang"]: r["s"]
        for r in bins.groupBy("lang").agg(F.sum("n_tokens").alias("s")).toLocalIterator()
    }
    d = with_tokens(table(spark, sf_dir, "documents"))
    truth = {
        r["lang"]: r["s"]
        for r in d.groupBy("lang")
        .agg(F.sum(F.size("tokens").cast("long")).alias("s"))
        .toLocalIterator()
    }
    assert per_lang == truth
    # dense bins from 0 per lang
    for r in bins.groupBy("lang").agg(
        F.min("bin_id").alias("lo"),
        F.max("bin_id").alias("hi"),
        F.count("*").alias("n"),
    ).toLocalIterator():
        assert r["lo"] == 0
        assert r["n"] == r["hi"] + 1


def test_gopher_fracs_bounded(spark, sf_dir):
    """Repetition fractions are valid fractions: 0 < top <= dup+top bound,
    dup_bigram_frac <= ~2 (token mass double-counts interior tokens) and the
    top bigram's mass never exceeds the duplicated mass unless it is the
    only repeated bigram."""
    g = gopher_repetition_filters(spark, sf_dir)
    bad = g.filter(
        (F.col("top_bigram_frac") <= 0)
        | (F.col("top_bigram_frac") > 2)
        | (F.col("dup_bigram_frac") < 0)
        | (F.col("dup_bigram_frac") > 2)
    ).count()
    assert bad == 0
    assert g.count() == table(spark, sf_dir, "documents").count()


def test_build_training_corpus_matches_funnel_query(spark, sf_dir):
    """The API composition must agree with the oracle-checked funnel query
    at the same thresholds, and its cleaned corpus must be internally
    consistent (ids unique + subset, split labels valid, token counts match
    the reassembled text)."""
    from sabd_deduplicator_spark.api import build_training_corpus
    from sabd_deduplicator_spark.operators.llm_pipeline import corpus_build_funnel

    docs = table(spark, sf_dir, "documents")
    res = build_training_corpus(spark, docs)
    api_report = {
        r["lang"]: (r["n_docs"], r["n_after_near"], r["n_after_len"],
                    r["n_final"], r["tokens_final"])
        for r in res.report.toLocalIterator()
    }
    q_report = {
        r["lang"]: (r["n_docs"], r["n_after_near"], r["n_after_len"],
                    r["n_final"], r["tokens_final"])
        for r in corpus_build_funnel(spark, sf_dir).toLocalIterator()
    }
    assert api_report == q_report

    clean = res.clean_docs
    n_clean = clean.count()
    assert n_clean == sum(v[3] for v in api_report.values())
    assert clean.select("doc_id").distinct().count() == n_clean
    assert clean.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    bad_tok = clean.filter(
        F.size(F.split("text", " ")).cast("long") != F.col("n_tokens")
    ).count()
    assert bad_tok == 0
    # cleaned docs are a subset of the input ids
    assert (
        clean.join(docs, "doc_id", "left_anti").count() == 0
    )


def test_exactsubstr_cut_identity_and_api_wiring(spark, sf_dir):
    """The cut stage keeps the reference's encode→recovery identity
    discipline (lib/deduplicator.ex:173-215) at the cut level: for every
    document, the extracted spans plus the kept text TILE the original —
    (1) length(text) == length(cut) + chars_cut, and (2) re-inserting each
    extracted span's characters at span_start reconstructs the original
    byte-exactly. Also: api.build_training_corpus(cut_repeated_spans=True)'s
    cut census must equal the oracle-checked corpus_build_funnel_cut's cut
    columns, and uncut docs pass through identical."""
    from sabd_deduplicator_spark.api import build_training_corpus
    from sabd_deduplicator_spark.operators.llm_pipeline import (
        corpus_build_funnel_cut,
        exactsubstr_cut,
        repeated_span_extract,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    cut = exactsubstr_cut(docs)

    # (1) length identity, every doc
    orig = docs.select("doc_id", F.length("text").alias("n0"))
    j = cut.select(
        "doc_id", F.length("text").alias("n1"), "chars_cut", "n_cut_spans"
    ).join(orig, "doc_id")
    assert j.filter(
        F.coalesce("n1", F.lit(0)) + F.col("chars_cut")
        != F.coalesce("n0", F.lit(0))
    ).count() == 0

    # (2) byte-exact reconstruction on a deterministic sample: the cut text
    # must equal the original with the certified spans deleted in place —
    # equivalently, re-inserting each span's characters at span_start
    # rebuilds the original exactly (checked python-side, where splicing
    # with a running offset is direct)
    spans = repeated_span_extract(spark, sf_dir)
    sample = (
        docs.join(spans.select("doc_id").distinct(), "doc_id")
        .orderBy("doc_id")
        .limit(20)
        .collect()
    )
    span_map: dict[int, list] = {}
    for r in (
        spans.join(
            spark.createDataFrame([(r["doc_id"],) for r in sample], "doc_id long"),
            "doc_id",
        )
        .orderBy("doc_id", "span_start")
        .collect()
    ):
        span_map.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    cut_map = {
        r["doc_id"]: r["text"]
        for r in cut.join(
            spark.createDataFrame([(r["doc_id"],) for r in sample], "doc_id long"),
            "doc_id",
        ).collect()
    }
    for r in sample:
        t = r["text"]
        kept, pos = [], 1
        for s, e in span_map[r["doc_id"]]:
            kept.append(t[pos - 1 : s - 1])
            pos = e + 1
        kept.append(t[pos - 1 :])
        assert "".join(kept) == cut_map[r["doc_id"]], r["doc_id"]

    # (3) api wiring: cut census equals the registered query's cut columns
    # (the api pipeline also needs `source` for the split/report stages)
    res = build_training_corpus(
        spark,
        table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text"
        ),
        cut_repeated_spans=True,
    )
    assert res.cut_census is not None
    api_census = {
        r["lang"]: (r["n_docs_cut"], r["chars_cut"])
        for r in res.cut_census.toLocalIterator()
    }
    q_census = {
        r["lang"]: (r["n_docs_cut"], r["chars_cut"])
        for r in corpus_build_funnel_cut(spark, sf_dir).toLocalIterator()
    }
    assert api_census == q_census
    # and the funnel over the cut corpus matches the query's funnel columns
    api_funnel = {
        r["lang"]: (r["n_docs"], r["n_after_near"], r["n_after_len"],
                    r["n_final"], r["tokens_final"])
        for r in res.report.toLocalIterator()
    }
    q_funnel = {
        r["lang"]: (r["n_docs"], r["n_after_near"], r["n_after_len"],
                    r["n_final"], r["tokens_final"])
        for r in corpus_build_funnel_cut(spark, sf_dir).toLocalIterator()
    }
    assert api_funnel == q_funnel


def test_unigram_logprob_mass_weighted_mean_is_corpus_entropy(spark, sf_dir):
    """The token-mass-weighted mean of per-doc cross-entropy must equal the
    corpus unigram entropy H = -sum_t p_t ln p_t (both average the same
    -ln p over the same token mass) — a cross-aggregation identity the
    per-row oracle can't see. Also: rare_ratio in [0,1], cross_entropy >= 0,
    and n_tok sums to the corpus token mass."""
    from sabd_deduplicator_spark.operators.llm_pipeline import doc_unigram_logprob

    res = doc_unigram_logprob(spark, sf_dir)
    bad = res.filter(
        (F.col("rare_ratio") < 0)
        | (F.col("rare_ratio") > 1)
        | (F.col("cross_entropy") < 0)
    ).count()
    assert bad == 0

    d = with_tokens(table(spark, sf_dir, "documents"))
    freq = (
        d.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cf"))
    )
    total = freq.agg(F.sum("cf").cast("double").alias("t")).first()["t"]
    h = freq.agg(
        F.sum(
            (F.col("cf") / F.lit(total)) * -F.log(F.col("cf") / F.lit(total))
        ).alias("h")
    ).first()["h"]
    agg = res.agg(
        (F.sum(F.col("cross_entropy") * F.col("n_tok")) / F.sum("n_tok")).alias(
            "weighted_ce"
        ),
        F.sum("n_tok").alias("mass"),
    ).first()
    assert agg["mass"] == int(total)
    # per-doc values are rounded to 6 dp before re-weighting
    assert abs(agg["weighted_ce"] - h) < 1e-5


def test_ppl_buckets_are_balanced_tertiles(spark, sf_dir):
    """Rank-tertile invariant the per-row oracle can't see: within every
    language the three buckets' doc counts differ by at most 1, cover all
    docs of that language, and bucket CE ranges are ordered
    head <= middle <= tail."""
    from sabd_deduplicator_spark.operators.llm_pipeline import ppl_bucket_stats

    rows = ppl_bucket_stats(spark, sf_dir)
    per_lang = {}
    for r in rows.toLocalIterator():
        per_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    d = table(spark, sf_dir, "documents")
    lang_counts = {
        r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).toLocalIterator()
    }
    for lang, buckets in per_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}
        counts = [buckets[b]["n_docs"] for b in ("head", "middle", "tail")]
        assert max(counts) - min(counts) <= 1
        assert sum(counts) == lang_counts[lang]
        assert buckets["head"]["max_ce"] <= buckets["middle"]["min_ce"]
        assert buckets["middle"]["max_ce"] <= buckets["tail"]["min_ce"]


def test_split_leakage_consistent_with_span_repeats(spark, sf_dir):
    """The leakage report must be non-vacuous on this corpus (near-dup docs
    share spans across splits by construction) and internally consistent:
    a leaked group has >= 1 occurrence on each side, so n_occurrences >=
    2 * n_groups and max_span_refs >= 2; and no pair can claim more groups
    than there are cross-doc repeated spans in the whole corpus."""
    from sabd_deduplicator_spark.operators.llm_pipeline import split_leakage_report

    rows = list(split_leakage_report(spark, sf_dir).toLocalIterator())
    assert rows, "expected span-level cross-split leakage on this corpus"
    d = with_tokens(table(spark, sf_dir, "documents"))
    spans = F.expr(
        "transform(sequence(0, CAST(ceil(size(tokens) / 8.0) AS INT) - 1), "
        "i -> array_join(slice(tokens, i * 8 + 1, 8), ' '))"
    )
    repeated = (
        d.select(F.explode(spans).alias("span"))
        .groupBy(F.md5("span").alias("h"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    for r in rows:
        assert r["split_a"] < r["split_b"]
        assert r["n_occurrences"] >= 2 * r["n_groups"]
        assert r["max_span_refs"] >= 2
        assert r["n_groups"] <= repeated


def test_neardup_split_leakage_partitions_the_pairs(spark, sf_dir):
    """The leakage groups must PARTITION the verified near-dup pairs: group
    sizes sum to the minhash_lsh_neardup pair count, and every group's
    avg_jaccard respects the 0.5 verification floor."""
    from sabd_deduplicator_spark.operators.llm_pipeline import neardup_split_leakage
    from sabd_deduplicator_spark.operators.similarity import minhash_lsh_neardup

    rows = list(neardup_split_leakage(spark, sf_dir).toLocalIterator())
    assert rows
    n_pairs = minhash_lsh_neardup(spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert 0.5 <= r["avg_jaccard"] <= 1.0
        assert r["avg_jaccard"] <= r["max_jaccard"] <= 1.0


def test_unigram_logprob_empty_corpus_yields_empty_report(spark, tmp_path):
    """An empty documents table must produce an empty report (and an empty
    ppl bucket report), not a NULL-total crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sabd_deduplicator_spark.operators.llm_pipeline import (
        doc_unigram_logprob,
        ppl_bucket_stats,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    assert doc_unigram_logprob(spark, str(tmp_path)).count() == 0
    assert ppl_bucket_stats(spark, str(tmp_path)).count() == 0


def test_scorecard_masses_reconcile_with_doc_level_signals(spark, sf_dir):
    """The per-source roll-up must reconcile exactly with the doc-level
    signals it composes: doc and token masses sum to the corpus totals, and
    each source's avg_ce stays inside the corpus-wide per-doc CE range."""
    from sabd_deduplicator_spark.operators.llm_pipeline import (
        doc_unigram_logprob,
        source_quality_scorecard,
    )

    rows = list(source_quality_scorecard(spark, sf_dir).toLocalIterator())
    assert rows
    ce = doc_unigram_logprob(spark, sf_dir)
    agg = ce.agg(
        F.count("*").alias("n"),
        F.sum("n_tok").alias("mass"),
        F.min("cross_entropy").alias("lo"),
        F.max("cross_entropy").alias("hi"),
    ).first()
    assert sum(r["n_docs"] for r in rows) == agg["n"]
    assert sum(r["n_tokens"] for r in rows) == agg["mass"]
    for r in rows:
        assert agg["lo"] <= r["avg_ce"] <= agg["hi"]
        assert 0.0 <= r["avg_rare_ratio"] <= 1.0
        assert 0.0 <= r["avg_dup_bigram"] <= 1.0


def test_novelty_curve_reconciles_with_span_dedup(spark, sf_dir):
    """The curve must partition the corpus exactly: decile doc/span/novel
    masses sum to span_dedup_corpus's totals and every novelty_rate is in
    (0, 1]. (No monotonicity claim: with ~50 docs per decile the
    first-occurrence bias toward early docs is well inside sampling noise
    on this corpus — that's a data property, not an operator invariant.)"""
    from sabd_deduplicator_spark.operators.llm_pipeline import (
        corpus_novelty_curve,
        span_dedup_corpus,
    )

    rows = sorted(
        (r.asDict() for r in corpus_novelty_curve(spark, sf_dir).toLocalIterator()),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    tot = span_dedup_corpus(spark, sf_dir).agg(
        F.count("*").alias("docs"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_kept").alias("novel"),
    ).first()
    assert sum(r["n_docs"] for r in rows) == tot["docs"]
    assert sum(r["n_spans"] for r in rows) == tot["spans"]
    assert sum(r["n_novel"] for r in rows) == tot["novel"]
    for r in rows:
        assert 0.0 < r["novelty_rate"] <= 1.0


def test_source_overlap_reconciles_with_per_source_span_sets(spark, sf_dir):
    """Every pair row must be internally consistent (shared <= min side,
    jaccard re-derivable from the three counts, a < b ordering) and the
    per-source totals must equal an independently computed distinct-span
    count for that source."""
    from sabd_deduplicator_spark.operators.llm_pipeline import (
        source_span_overlap,
        span_survivorship,
    )
    from sabd_deduplicator_spark.operators.text import with_tokens
    from sabd_deduplicator_spark.catalog import table

    rows = [r.asDict() for r in source_span_overlap(spark, sf_dir).toLocalIterator()]
    assert rows
    d = with_tokens(table(spark, sf_dir, "documents"))
    spans = F.expr(
        "transform(sequence(0, CAST(ceil(size(tokens) / 8.0) AS INT) - 1), "
        "i -> array_join(slice(tokens, i * 8 + 1, 8), ' '))"
    )
    expected = {
        r["source"]: r["n"]
        for r in d.select("source", F.explode(spans).alias("span"))
        .select("source", F.md5("span").alias("h"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .toLocalIterator()
    }
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["shared_spans"] <= min(r["spans_a"], r["spans_b"])
        assert r["spans_a"] == expected[r["source_a"]]
        assert r["spans_b"] == expected[r["source_b"]]
        denom = r["spans_a"] + r["spans_b"] - r["shared_spans"]
        assert abs(r["jaccard"] - round(r["shared_spans"] / denom, 6)) < 1e-12


def test_vocab_coverage_monotone_and_reconciles(spark, sf_dir):
    """Coverage must be monotone non-decreasing in k, covered mass must
    never exceed the total, the total must equal the corpus token count,
    and with k_max above this corpus's 31-type vocabulary the last point
    must cover everything."""
    from sabd_deduplicator_spark.operators.text import (
        COVERAGE_KS,
        vocab_coverage_curve,
        with_tokens,
    )
    from sabd_deduplicator_spark.catalog import table

    rows = sorted(
        (r.asDict() for r in vocab_coverage_curve(spark, sf_dir).toLocalIterator()),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == sorted(COVERAGE_KS)
    d = with_tokens(table(spark, sf_dir, "documents"))
    total = d.agg(F.sum(F.size("tokens"))).first()[0]
    n_types = d.select(F.explode("tokens")).distinct().count()
    covered = [r["covered_tokens"] for r in rows]
    assert covered == sorted(covered)
    for r in rows:
        assert r["total_tokens"] == total
        assert 0 < r["covered_tokens"] <= total
        assert abs(r["coverage"] - round(r["covered_tokens"] / total, 6)) < 1e-12
    if max(COVERAGE_KS) >= n_types:
        assert rows[-1]["covered_tokens"] == total


def test_lang_confusion_partitions_the_corpus(spark, sf_dir):
    """Matrix masses must partition the corpus: per-label shares sum to 1,
    doc counts sum to the table count, and every (label, guess) row's share
    re-derives from the counts."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.text import lang_id_confusion

    rows = [r.asDict() for r in lang_id_confusion(spark, sf_dir).toLocalIterator()]
    assert rows
    n_total = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        n_lang = sum(r["n_docs"] for r in rs)
        for r in rs:
            assert abs(r["pct_of_lang"] - round(r["n_docs"] / n_lang, 6)) < 1e-12
        assert abs(sum(r["pct_of_lang"] for r in rs) - 1.0) < 1e-4


def test_quality_by_split_masses_and_split_sizes(spark, sf_dir):
    """The three buckets must cover the corpus at roughly 80/10/10 (md5
    bucketing: binomial noise only) and every mean must be a valid ratio."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.llm_pipeline import quality_by_split

    rows = {r["split"]: r.asDict() for r in quality_by_split(spark, sf_dir).toLocalIterator()}
    assert set(rows) == {"train", "val", "test"}
    n_total = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_total
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]
    for r in rows.values():
        assert 0.0 <= r["avg_stop_ratio"] <= 1.0
        assert 0.0 < r["avg_distinct_ratio"] <= 1.0
        assert r["avg_tokens"] > 0


def test_dedup_rate_by_source_reconciles_with_corpus_totals(spark, sf_dir):
    """Per-source span/novel masses must sum to span_dedup_corpus's totals
    and every dup_rate must re-derive from its own row."""
    from sabd_deduplicator_spark.operators.llm_pipeline import (
        dedup_rate_by_source,
        span_dedup_corpus,
    )

    rows = [r.asDict() for r in dedup_rate_by_source(spark, sf_dir).toLocalIterator()]
    assert rows
    tot = span_dedup_corpus(spark, sf_dir).agg(
        F.sum("n_spans").alias("spans"), F.sum("n_kept").alias("novel")
    ).first()
    assert sum(r["n_spans"] for r in rows) == tot["spans"]
    assert sum(r["n_novel"] for r in rows) == tot["novel"]
    for r in rows:
        assert 0 < r["n_novel"] <= r["n_spans"]
        assert abs(
            r["dup_rate"] - round(1.0 - r["n_novel"] / r["n_spans"], 6)
        ) < 1e-12


def test_repeated_span_extract_invariants(spark, sf_dir):
    """Maximal-span structure: every span is >= W chars, lies inside its
    document, spans of one doc are disjoint AND non-adjacent (separated by
    > 1 char of non-certified text — else they would have merged), and the
    per-doc certified mass never exceeds what the census reports globally."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.llm_pipeline import (
        SUBSTR_W,
        repeated_span_extract,
        repeated_substring_census,
    )

    spans = repeated_span_extract(spark, sf_dir)
    lens = table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("doc_len")
    )
    rows = [
        r.asDict()
        for r in spans.join(lens, "doc_id").toLocalIterator()
    ]
    assert rows
    by_doc: dict = {}
    for r in rows:
        assert r["span_len"] >= SUBSTR_W
        assert 1 <= r["span_start"] <= r["span_end"] <= r["doc_len"]
        assert r["span_len"] == r["span_end"] - r["span_start"] + 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["span_start"])
        for a, b in zip(doc_rows, doc_rows[1:]):
            # islands merge when position gap <= W, so surviving spans are
            # separated by more than W - (W-1) = 1 uncertified position
            assert b["span_start"] > a["span_end"] + 1
    census = repeated_substring_census(spark, sf_dir).first()
    # every span contains at least one repeated window; islands can't
    # outnumber repeated positions
    assert len(rows) <= census["repeated_mass"]


def test_bpe_replace_trick_equals_imperative_greedy(spark):
    """The delimiter-doubling replace() encoding in bpe_learn_merges must
    reproduce IMPERATIVE leftmost-greedy BPE exactly — stressed on the
    adversarial chains where naive encodings break: a^n self-merge chains,
    (ab)^n alternations, merges of already-merged symbols."""
    import collections

    toks = ["aaaaaa", "ababab", "aabab", "bbb", "abba", "aaabaaa", "ab",
            "a", "ba" * 7, "xaay", "aaaa"]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i in range(2)], "doc_id long, text string"
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="bpe_chain_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    from sabd_deduplicator_spark.operators.text import (
        BPE_LEARN_ROUNDS,
        bpe_learn_merges,
    )

    got = [
        (r["round"], r["sym_a"], r["sym_b"], r["n"])
        for r in bpe_learn_merges(spark, d).orderBy("round").collect()
    ]
    # imperative reference (two identical docs → counts double)
    states = [list(t) for t in toks for _ in range(2)]
    ref = []
    for rnd in range(1, BPE_LEARN_ROUNDS + 1):
        cnt = collections.Counter()
        for s in states:
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += 1
        if not cnt:
            break
        mx = max(cnt.values())
        key = sorted("\x01".join(k) for k, v in cnt.items() if v == mx)[0]
        a, b = key.split("\x01")
        ref.append((rnd, a, b, mx))
        nxt = []
        for s in states:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append(out)
        states = nxt
    assert got == ref, (got, ref)


def test_census_fast_path_equals_md5_census(spark, sf_dir, tmp_path):
    """The Rabin-Karp fingerprint census (repeated_substring_census_fast)
    must return EXACTLY the md5 census's rows — on the real corpus and on
    the reference's adversarial pathology (a 64-byte pattern duplicated
    across documents, test/deduplicator_test.exs:115-138), where every
    window of the duplicated region repeats and off-by-one fingerprint
    indexing would show up immediately."""
    fast = registry.QUERIES["repeated_substring_census_fast"]
    slow = registry.QUERIES["repeated_substring_census"]
    assert fast(spark, sf_dir).collect() == slow(spark, sf_dir).collect()

    pat = "0123456789abcdef" * 4  # the 64-byte duplicated block
    docs = spark.createDataFrame(
        [
            (0, pat + "tail one " + pat),           # twice within one doc
            (1, "prefix " + pat + " suffix"),       # cross-doc repeat
            (2, "entirely unique text body " * 4),
            (3, "short"),                            # below W — excluded
            (4, None),                               # NULL — excluded
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path / "pathology")
    docs.write.parquet(f"{d}/documents.parquet")
    got = fast(spark, d).collect()
    want = slow(spark, d).collect()
    assert got == want
    assert got[0]["n_crossdoc_windows"] > 0  # the pathology actually fires


def test_fp_spans_and_flags_equal_md5_path(spark, sf_dir, tmp_path):
    """The span consumers now run on the xxhash64 window relation
    (_fp_positions_df). Since they use window keys for EQUALITY only,
    their outputs must be row-identical to the md5 relation's — for the
    maximal-span extraction (what exactsubstr_cut and the cut funnel
    consume) and the doc-level flags, on the real corpus AND the
    reference's 64-byte duplication pathology
    (test/deduplicator_test.exs:115-138)."""
    from sabd_deduplicator_spark.operators.llm_pipeline import (
        _fp_positions_df,
        _stride1_windows_df,
        repeated_spans,
    )

    def spans_sorted(w):
        return repeated_spans(w).orderBy("doc_id", "span_id").collect()

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    assert spans_sorted(_fp_positions_df(docs)) == spans_sorted(
        _stride1_windows_df(docs)
    )

    pat = "0123456789abcdef" * 4
    pdocs = spark.createDataFrame(
        [
            (0, pat + "tail one " + pat),
            (1, "prefix " + pat + " suffix"),
            (2, "entirely unique text body " * 4),
            (3, "short"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = spans_sorted(_fp_positions_df(pdocs))
    assert got == spans_sorted(_stride1_windows_df(pdocs))
    assert len(got) >= 3  # both docs 0/1 carry certified spans

    # flags: the registered (fp) query vs the md5-relation rebuild of the
    # same aggregate
    flags = registry.QUERIES["doc_repeated_substring_flags"]
    w = _stride1_windows_df(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    hot = (
        w.groupBy("h").agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2).select("h")
    )
    per = w.groupBy("doc_id").agg(F.count("*").alias("n_pos"))
    rep = (
        w.join(hot, "h", "left_semi")
        .groupBy("doc_id").agg(F.count("*").alias("n_rep"))
    )
    from sabd_deduplicator_spark.operators.llm_pipeline import SUBSTR_FLAG_MIN

    ratio = F.col("n_rep").cast("double") / F.col("n_pos")
    want = (
        per.join(rep, "doc_id", "left")
        .withColumn("n_rep", F.coalesce("n_rep", F.lit(0)))
        .filter(ratio >= SUBSTR_FLAG_MIN)
        .select(
            "doc_id", "n_pos", "n_rep", F.round(ratio, 6).alias("rep_ratio")
        )
        .orderBy("doc_id")
        .collect()
    )
    assert flags(spark, sf_dir).orderBy("doc_id").collect() == want


def test_bpe_encode_vocab_reconstructs_tokens(spark, sf_dir):
    """Encoding invariants: for every reported token, the encoded symbols
    concatenate back to the token exactly (merges never lose characters),
    n_symbols == len(symbols) <= len(token), and every applied merge's
    output symbol actually appears somewhere (the merge table did work)."""
    from sabd_deduplicator_spark.operators.text import (
        _learn_bpe_rounds,
        bpe_encode_vocab,
    )

    rows = bpe_encode_vocab(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        syms = r["symbols"].split(" ")
        assert "".join(syms) == r["token"]
        assert r["n_symbols"] == len(syms) <= len(r["token"])
    merges = _learn_bpe_rounds(spark, sf_dir)
    assert merges  # the corpus has repeated pairs
    merged_syms = {a + b for _, a, b, _n in merges}
    seen = {s for r in rows for s in r["symbols"].split(" ")}
    assert merged_syms & seen  # at least one learned merge shows up in the head
