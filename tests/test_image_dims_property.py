"""Property tests for the codec-free image-dimension walker
(sources/multimodal.parse_image_dims) — the production decode path behind
media_image_dims and media_feature_extract. Pure Python, no Spark session.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sabd_deduplicator_spark.sources.multimodal import parse_image_dims


def png_bytes(w: int, h: int, tail: bytes) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + tail
    )


def jpeg_sof(w: int, h: int) -> bytes:
    # SOF0, len 11, precision 8, 1 component
    return b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08" + h.to_bytes(
        2, "big"
    ) + w.to_bytes(2, "big") + b"\x01\x11\x00\x00"


@given(
    w=st.integers(0, 2**31 - 1),
    h=st.integers(0, 2**31 - 1),
    tail=st.binary(max_size=64),
)
@settings(max_examples=200, deadline=None)
def test_png_dims_roundtrip(w, h, tail):
    assert parse_image_dims(png_bytes(w, h, tail)) == (w, h)


@given(
    w=st.integers(0, 65535),
    h=st.integers(0, 65535),
    n_pad=st.integers(0, 5),
    n_rst=st.integers(0, 3),
    app_payload=st.binary(max_size=32),
    tail=st.binary(max_size=64),
)
@settings(max_examples=200, deadline=None)
def test_jpeg_dims_survive_marker_noise(w, h, n_pad, n_rst, app_payload, tail):
    """SOF must be found through fill bytes (0xFF padding), standalone RST
    markers, and arbitrary APP0 segments preceding it — the real-world
    JPEG preamble zoo."""
    pre = b"\xff\xd8"
    pre += b"\xff" * n_pad  # fill bytes before a marker are legal
    pre += b"\xff\xe0" + (2 + len(app_payload)).to_bytes(2, "big") + app_payload
    pre += b"\xff\xd0" * n_rst  # standalone RST markers, no length field
    assert parse_image_dims(pre + jpeg_sof(w, h) + tail) == (w, h)


@given(data=st.binary(max_size=64))
@settings(max_examples=200, deadline=None)
def test_arbitrary_bytes_never_return_garbage(data):
    """Random bytes either raise ValueError or are a genuine container
    prefix — parse must never silently fabricate dimensions for
    non-image payloads."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" or data[:2] == b"\xff\xd8":
        try:
            parse_image_dims(data)
        except ValueError:
            pass
    else:
        with pytest.raises(ValueError):
            parse_image_dims(data)


def test_jpeg_dht_before_sof_is_skipped():
    """A DHT (0xC4) segment must be skipped, not misread as SOF (0xC4 is in
    the 0xC0-0xCF range but is not a start-of-frame)."""
    dht = b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x01"
    assert parse_image_dims(b"\xff\xd8" + dht + jpeg_sof(320, 240)) == (320, 240)
