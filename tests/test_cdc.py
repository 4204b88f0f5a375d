"""Content-defined chunking: semantics invariants for both the SQL path
(`chunk_cdc`, oracle-checked in the registry) and the Gear production path
(`chunk_cdc_gear`, mapInPandas).

The class-defining properties of CDC (LBFS SOSP'01):
1. lossless — chunks reassemble to the original input, in line order;
2. content-defined — boundaries depend only on a local window, so a prefix
   edit re-synchronizes and most chunks are shared with the edited twin;
3. bounded (gear path) — every non-final chunk length in [GEAR_MIN, GEAR_MAX].
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.operators.cdc import (
    GEAR_MAX,
    GEAR_MIN,
    chunk_cdc,
    chunk_cdc_gear,
)

EDGE_ROWS = [
    (1, None),
    (2, ""),
    (3, "short"),  # < W: no eligible cut, comes back whole
    (4, "東京-мир-🌍 unicode content that is long enough to chunk " * 4),
    (5, "x" * 500),  # degenerate repetition: every window identical
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")


def _reassemble(rows):
    docs = {}
    for r in rows:
        docs.setdefault(r.doc_id, []).append((r.line, r.chunk))
    return {
        d: b"".join(c for _, c in sorted(parts))
        if isinstance(parts[0][1], (bytes, bytearray))
        else "".join(c for _, c in sorted(parts))
        for d, parts in docs.items()
    }


def test_sql_cdc_lossless_and_edges(edge_df):
    out = _reassemble(chunk_cdc(edge_df).collect())
    assert 1 not in out and 2 not in out  # NULL/empty → zero chunks
    assert out[3] == "short"
    assert out[4] == EDGE_ROWS[3][1]
    assert out[5] == "x" * 500


def test_sql_cdc_lossless_on_corpus(spark, sf_dir):
    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}
    out = _reassemble(chunk_cdc(table(spark, sf_dir, "documents")).collect())
    assert out == {d: t for d, t in docs.items() if t}


def test_gear_lossless_bounded(spark, sf_dir):
    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}
    rows = chunk_cdc_gear(table(spark, sf_dir, "documents")).collect()
    out = _reassemble(rows)
    assert out == {d: t.encode() for d, t in docs.items() if t}
    last_line = {}
    for r in rows:
        last_line[r.doc_id] = max(last_line.get(r.doc_id, -1), r.line)
    for r in rows:
        assert r.n_bytes == len(r.chunk) <= GEAR_MAX
        if r.line < last_line[r.doc_id] and len(docs[r.doc_id].encode()) >= GEAR_MIN:
            assert r.n_bytes >= GEAR_MIN


def test_gear_edges(edge_df):
    rows = chunk_cdc_gear(edge_df).collect()
    out = _reassemble(rows)
    assert 1 not in out and 2 not in out
    assert out[3] == b"short"
    assert out[4] == EDGE_ROWS[3][1].encode()
    # degenerate input still respects the max bound (forced cuts)
    assert all(r.n_bytes <= GEAR_MAX for r in rows)


def test_gear_shift_robustness(spark, sf_dir):
    """Prefix-edit a copy of every doc; the gear chunk store must reuse most
    distinct chunks (fixed-size would reuse ~none — pinned by the
    dedup_cdc_vs_fixed oracle census)."""
    docs = table(spark, sf_dir, "documents")
    twin = docs.select("doc_id", F.expr("'EDIT:' || text").alias("text"))
    o = {bytes(r.chunk) for r in chunk_cdc_gear(docs).collect()}
    t = {bytes(r.chunk) for r in chunk_cdc_gear(twin).collect()}
    assert len(o & t) / len(o) > 0.5


def test_gear_cut_points_pure():
    """Pure-function spot checks: determinism, bounds, locality."""
    from sabd_deduplicator_spark.operators.cdc import _gear_cut_points, _gear_table

    import random

    gear = _gear_table()
    # non-periodic body: repeating content is the known CDC pathology where
    # min-size suppression never re-locks phase (forced-cut territory)
    data = random.Random(7).randbytes(1800)
    cuts = _gear_cut_points(data, gear)
    assert cuts == _gear_cut_points(data, gear)
    bounds = [0, *cuts, len(data)]
    for s, e in zip(bounds, bounds[1:-1]):
        assert GEAR_MIN <= e - s <= GEAR_MAX
    # suffix stability: identical tails of a shifted input share cut offsets
    shifted = b"PREFIX-INSERTED::" + data
    tail_cuts = {len(data) - c for c in cuts}
    tail_cuts_shifted = {len(shifted) - c for c in _gear_cut_points(shifted, gear)}
    shared = tail_cuts & tail_cuts_shifted
    assert len(shared) >= len(tail_cuts) * 0.6
