"""minhash_index_staleness verdict logic on threshold-CROSSING corpora —
the event the monitor exists to catch, which the near-uniform driver
testdata never produces: a shingle becoming ubiquitous after the index
froze its hot set (newly_hot — appends are not capping it, band buckets
crowd) and a stored-hot shingle falling below the bar (cooled — stored
sketches capped what a fresh build would keep). Also runs the DuckDB
oracle on the same corpus, so the crossing rows are parity-checked, not
just asserted."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tools.parity import compare


def _write_docs(d: str, texts: list[str]) -> None:
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["src0"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )


def test_staleness_flags_threshold_crossings(spark, tmp_path):
    """20 docs: stratum = doc_id % 10 <> 0 (18 docs), delta = {0, 10}.
    - 'old old' is hot in the stratum (10/18 docs: 20 > 18) but absent from
      the delta → fresh 10/20 (20 <= 20) → COOLED;
    - 'new new' is sub-threshold in the stratum (9/18: 18 <= 18) but in
      both delta docs → fresh 11/20 (22 > 20) → NEWLY_HOT;
    either crossing must flip rebuild_recommended to True on every row."""
    from sabd_deduplicator_spark.operators.minhash_index import (
        minhash_index_staleness,
    )
    from sabd_deduplicator_spark.registry import ORACLES

    texts = []
    for i in range(20):
        stratum = i % 10 != 0
        parts = [f"filler{i} body{i}"]
        if stratum and (i % 20) <= 11:  # 10 stratum docs: 1..9 and 11
            parts.append("old old")
        if (not stratum) or (i % 20) in (2, 3, 4, 5, 6, 7, 8, 9, 11):
            parts.append("new new")     # 9 stratum docs + both delta docs
        texts.append(" ".join(parts))
    d = str(tmp_path)
    _write_docs(d, texts)

    sdf = minhash_index_staleness(spark, d).toPandas()
    by_sh = {r["sh"]: r for _, r in sdf.iterrows()}
    assert by_sh["old old"]["status"] == "cooled"
    assert bool(by_sh["old old"]["was_hot"]) and not bool(by_sh["old old"]["now_hot"])
    assert by_sh["new new"]["status"] == "newly_hot"
    assert not bool(by_sh["new new"]["was_hot"]) and bool(by_sh["new new"]["now_hot"])
    assert sdf["rebuild_recommended"].all()
    # drift accounting: stored df vs fresh df for the crossing shingles
    assert by_sh["old old"]["stored_df"] == 10 and by_sh["old old"]["fresh_df"] == 10
    assert by_sh["new new"]["stored_df"] == 9 and by_sh["new new"]["fresh_df"] == 11

    # and the oracle agrees on this corpus (the driver testdata never
    # exercises the crossing branches); only the documents view is needed
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    odf = con.sql(ORACLES["minhash_index_staleness"]).df()
    ok, msg = compare("minhash_index_staleness", sdf, odf)
    assert ok, msg


def test_staleness_steady_state_recommends_nothing(spark, tmp_path):
    """No crossings (hot stays hot, cold stays cold) → every row reads
    rebuild_recommended = False even with nonzero drift."""
    from sabd_deduplicator_spark.operators.minhash_index import (
        minhash_index_staleness,
    )

    texts = []
    for i in range(20):
        parts = [f"filler{i} body{i}"]
        if (i % 20) != 5:               # 17 stratum docs + both delta docs
            parts.append("hot hot")     # hot both before (17/18) and after (19/20)
        texts.append(" ".join(parts))
    d = str(tmp_path)
    _write_docs(d, texts)
    sdf = minhash_index_staleness(spark, d).toPandas()
    assert len(sdf) > 0
    assert not sdf["rebuild_recommended"].any()
    hot_row = sdf[sdf["sh"] == "hot hot"].iloc[0]
    assert hot_row["status"] == "steady_hot"
    # drift is reported (17 stored → 19 fresh) without tripping the verdict
    assert hot_row["drift"] == 2
