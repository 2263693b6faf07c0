"""Multimodal plumbing tests (SURVEY §2.6)."""

from __future__ import annotations

import hashlib

import pytest

from fdblog2clickhouse_spark.operators import multimodal

from .oracle import compare


def test_metadata_oracle_parity(spark, sf_oracle):
    df = multimodal.multimodal_metadata(spark, sf_oracle)
    compare(df, multimodal.ORACLE["multimodal_metadata"], sf_oracle)


def test_chunker_reassembles(spark, sf_smoke):
    """Chunks must reassemble exactly into the payload (Arrow round-trip
    fidelity for binary columns; chunks travel as lossless hex)."""
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in multimodal.with_payload(spark, sf_smoke).collect()
    }
    chunks = multimodal.multimodal_chunk(spark, sf_smoke).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(payloads)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        joined = b"".join(bytes.fromhex(r["chunk_hex"]) for r in rows)
        assert joined == payloads[doc_id]
        assert all(r["chunk_len"] == len(bytes.fromhex(r["chunk_hex"])) for r in rows)


def test_chunk_oracle_parity(spark, sf_oracle):
    df = multimodal.multimodal_chunk(spark, sf_oracle)
    compare(df, multimodal.ORACLE["multimodal_chunk"], sf_oracle)


def test_payload_checksum_is_real_md5(spark, sf_smoke):
    rows = multimodal.multimodal_metadata(spark, sf_smoke).limit(5).collect()
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in multimodal.with_payload(spark, sf_smoke).collect()
    }
    for r in rows:
        expect = hashlib.md5(payloads[r["doc_id"]].hex().upper().encode()).hexdigest()
        assert r["payload_md5"] == expect


def test_feature_extract_matches_python_reference(spark, sf_smoke):
    """Features computed through the Arrow/mapInPandas path must equal
    a direct Python computation on the same deterministic payloads."""
    import hashlib
    import math

    from fdblog2clickhouse_spark.operators.multimodal import (
        multimodal_feature_extract,
        with_payload,
    )

    rows = {
        r["doc_id"]: r
        for r in multimodal_feature_extract(spark, sf_smoke).collect()
    }
    src = with_payload(spark, sf_smoke).select("doc_id", "payload").limit(20).collect()
    assert rows
    for s in src:
        b = bytes(s["payload"])
        r = rows[s["doc_id"]]
        assert r["n_bytes"] == len(b)
        assert r["byte_mean"] == pytest.approx(sum(b) / len(b))
        counts = {}
        for x in b:
            counts[x] = counts.get(x, 0) + 1
        ent = -sum((c / len(b)) * math.log2(c / len(b)) for c in counts.values())
        assert r["entropy_micro"] == math.floor(ent * 1_000_000)
        assert r["distinct_bytes"] == len(counts)


def test_feature_extract_oracle_parity(spark, sf_oracle):
    df = multimodal.multimodal_feature_extract(spark, sf_oracle)
    compare(df, multimodal.ORACLE["multimodal_feature_extract"], sf_oracle)


def test_decode_is_stubbed_for_non_bmp():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00" * 64)


def test_decode_bmp_real_values():
    """The codec-free BMP branch must recover exactly what a
    hand-assembled BMP encodes — header fields AND pixel bytes."""
    pixels = bytes(range(12))  # one 4px 24-bpp row, no padding needed
    payload = (
        b"BM"
        + (54 + 12).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (4).to_bytes(4, "little", signed=True)   # width 4 → row 12 bytes
        + (1).to_bytes(4, "little", signed=True)   # height 1
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (12).to_bytes(4, "little")
        + b"\x00" * 16
        + pixels
    )
    d = multimodal.decode_image(payload)
    assert d["format"] == "bmp"
    assert (d["width"], d["height"], d["bpp"]) == (4, 1, 24)
    assert d["n_pixel_bytes"] == 12
    assert d["pixels"] == pixels


def test_decode_bmp_rejects_compressed():
    payload = bytearray(multimodal._bmp_bytes(0, "x"))
    payload[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(bytes(payload))


def test_decode_bmp_rejects_truncated_raster():
    """Header fields are untrusted: a 'BM' buffer whose declared
    raster exceeds the actual bytes must raise, never return an
    inconsistent dict."""
    payload = multimodal._bmp_bytes(0, "x")
    with pytest.raises(ValueError):
        multimodal.decode_image(payload[:-1])


def test_decode_ppm_real_values():
    """The P6 branch recovers a hand-assembled PPM exactly, including
    a '#' comment in the header."""
    pixels = bytes(range(24))  # 4x2 RGB
    payload = b"P6\n# a comment\n4 2\n255\n" + pixels
    d = multimodal.decode_image(payload)
    assert d["format"] == "ppm"
    assert (d["width"], d["height"], d["bpp"]) == (4, 2, 24)
    assert d["n_pixel_bytes"] == 24
    assert d["pixels"] == pixels


def test_decode_pgm_real_values():
    pixels = bytes(range(8))  # 4x2 grayscale
    payload = b"P5 4 2 255 " + pixels
    d = multimodal.decode_image(payload)
    assert d["format"] == "pgm"
    assert (d["width"], d["height"], d["bpp"]) == (4, 2, 8)
    assert d["pixels"] == pixels


def test_decode_ppm_rejects_truncated_raster():
    with pytest.raises(ValueError):
        multimodal.decode_image(multimodal._ppm_bytes(1, "x")[:-1])


def test_decode_tga_real_values():
    pixels = bytes(range(12))  # 2x2 24-bpp
    header = (
        bytes([0, 0, 2]) + b"\x00" * 5 + b"\x00" * 4
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([24, 0])
    )
    d = multimodal.decode_image(header + pixels)
    assert d["format"] == "tga"
    assert (d["width"], d["height"], d["bpp"]) == (2, 2, 24)
    assert d["n_pixel_bytes"] == 12
    assert d["pixels"] == pixels


def test_decode_tga_rejects_truncated_raster():
    """A structurally-valid TGA header with missing raster bytes is a
    corrupt file (ValueError), not an unknown format (stub)."""
    with pytest.raises(ValueError):
        multimodal.decode_image(multimodal._tga_bytes(2, "x")[:-1])


def test_decode_routes_all_three_formats():
    """doc_id % 3 routing exercises every real branch."""
    for doc_id, expect in ((0, "bmp"), (1, "ppm"), (2, "tga")):
        payload = multimodal._FORMAT_BUILDERS[doc_id % 3](doc_id, "hello")
        assert multimodal.decode_image(payload)["format"] == expect


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    seed=st.binary(min_size=1, max_size=64),
)
def test_decode_roundtrip_property(w, h, seed):
    """Encode→decode round-trip for arbitrary dimensions and pixel
    content across all three real formats: every header field and
    every raster byte must come back exactly."""
    npix_unpadded = w * h * 3
    raster = (seed * (npix_unpadded // len(seed) + 1))[:npix_unpadded]

    # PPM: exact unpadded raster
    ppm = b"P6\n%d %d\n255\n" % (w, h) + raster
    d = multimodal.decode_image(ppm)
    assert (d["format"], d["width"], d["height"], d["bpp"]) == ("ppm", w, h, 24)
    assert d["pixels"] == raster

    # TGA: exact unpadded raster, 18-byte header
    tga = (
        bytes([0, 0, 2]) + b"\x00" * 5 + b"\x00" * 4
        + w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([24, 0])
    ) + raster
    d = multimodal.decode_image(tga)
    assert (d["format"], d["width"], d["height"], d["bpp"]) == ("tga", w, h, 24)
    assert d["pixels"] == raster

    # BMP: rows padded to 4 bytes
    row = ((w * 24 + 31) // 32) * 4
    npix = row * h
    padded = (seed * (npix // len(seed) + 1))[:npix]
    bmp = (
        b"BM" + (54 + npix).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + npix.to_bytes(4, "little")
        + b"\x00" * 16
    ) + padded
    d = multimodal.decode_image(bmp)
    assert (d["format"], d["width"], d["height"], d["bpp"]) == ("bmp", w, h, 24)
    assert d["n_pixel_bytes"] == npix
    assert d["pixels"] == padded


def test_decode_oracle_parity(spark, sf_oracle):
    df = multimodal.multimodal_decode(spark, sf_oracle)
    compare(df, multimodal.ORACLE["multimodal_decode"], sf_oracle)


def test_frame_sample_oracle_parity(spark, sf_oracle):
    """The mapInPandas frame sampler is oracle-checked: the synthetic
    payload's frame structure is reconstructable in closed form."""
    df = multimodal.multimodal_frame_sample(spark, sf_oracle)
    compare(df, multimodal.ORACLE["multimodal_frame_sample"], sf_oracle)


def test_frame_sample_stride(spark, sf_smoke):
    """Only even frame indices survive; 3-frame docs yield 2 samples."""
    rows = multimodal.multimodal_frame_sample(spark, sf_smoke).collect()
    assert rows and all(r["frame_idx"] % 2 == 0 for r in rows)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in per_doc.items():
        n_frames = 1 + doc_id % 3
        assert sorted(idxs) == list(range(0, n_frames, 2))
