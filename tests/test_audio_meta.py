"""media_audio_meta: the audio twin of the image-dims family."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from sabd_deduplicator_spark.sources.multimodal import parse_wav_meta


def test_parse_wav_meta_roundtrips_struct_built_headers():
    for ch, rate, bits, data in [
        (1, 8000, 8, b""),
        (2, 44100, 16, b"\x00" * 7),
        (6, 192000, 24, b"x" * 1000),
    ]:
        ba = ch * bits // 8
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * ba, ba, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        assert parse_wav_meta(hdr) == (ch, rate, bits, rate * ba, len(data))


@pytest.mark.parametrize(
    "bad",
    [b"", b"RIFF", b"RIFX" + b"\x00" * 40, b"RIFF" + b"\x00" * 40],
)
def test_parse_wav_meta_rejects_non_wav(bad):
    with pytest.raises(ValueError):
        parse_wav_meta(bad)


def test_audio_meta_fields_reconcile_with_planted_metadata(spark, sf_dir):
    """Every extracted field must equal the planted derivation (the header
    walk must read back exactly what the synthesizer wrote), and the
    duration must re-derive integer-exactly."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.multimodal import media_audio_meta

    rows = {
        r["blob_id"]: r.asDict()
        for r in media_audio_meta(spark, sf_dir).toLocalIterator()
    }
    docs = {
        r["doc_id"]: r.asDict()
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars", F.octet_length(F.encode("text", "UTF-8")).alias("nb"))
        .toLocalIterator()
    }
    assert set(rows) == set(docs)
    for blob_id, r in rows.items():
        d = docs[blob_id]
        ch = blob_id % 2 + 1
        rate = 8000 + (d["n_chars"] % 5) * 4000
        bits = 8 + (d["n_chars"] % 2) * 8
        ba = ch * bits // 8
        assert r["channels"] == ch
        assert r["sample_rate"] == rate
        assert r["bits"] == bits
        assert r["data_bytes"] == d["nb"]
        assert r["est_duration_ms"] == d["nb"] * 1000 // (rate * ba)


def test_parse_mp4_meta_walks_reordered_boxes():
    """The parser must WALK boxes, not assume offsets: free box injected
    before moov, moov after mdat — both must still resolve mvhd."""
    import struct

    from sabd_deduplicator_spark.sources.multimodal import parse_mp4_meta

    mvhd = (
        struct.pack(">I", 108) + b"mvhd"
        + struct.pack(">IIIII", 0, 0, 0, 1200, 54321) + b"\x00" * 80
    )
    moov = struct.pack(">I", 116) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
    free = struct.pack(">I", 12) + b"free" + b"\x00" * 4
    mdat = struct.pack(">I", 12) + b"mdat" + b"abcd"
    assert parse_mp4_meta(ftyp + free + moov + mdat) == (1200, 54321)
    assert parse_mp4_meta(ftyp + mdat + moov) == (1200, 54321)
    with pytest.raises(ValueError):
        parse_mp4_meta(ftyp + mdat)  # no moov
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00\x00\x00\x08mdat")  # no ftyp


def test_video_meta_fields_reconcile_with_planted_metadata(spark, sf_dir):
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.multimodal import media_video_meta

    rows = {
        r["blob_id"]: r.asDict()
        for r in media_video_meta(spark, sf_dir).toLocalIterator()
    }
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .toLocalIterator()
    }
    assert set(rows) == set(docs)
    for blob_id, r in rows.items():
        nc = docs[blob_id]
        ts = 600 + (nc % 4) * 300
        dur = (nc * 13) % 100000
        assert r["timescale"] == ts
        assert r["duration_ticks"] == dur
        assert r["duration_ms"] == dur * 1000 // ts
