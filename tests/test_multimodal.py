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


def test_decode_routes_all_five_formats():
    """doc_id % 5 routing exercises every real branch — including
    the compressed PNG (zlib) and GIF (LZW) paths."""
    for doc_id, expect in (
        (0, "bmp"), (1, "ppm"), (2, "tga"), (3, "png"), (4, "gif"),
    ):
        payload = multimodal._FORMAT_BUILDERS[doc_id % 5](doc_id, "hello")
        assert multimodal.decode_image(payload)["format"] == expect


def test_decode_png_real_values():
    """The stdlib PNG branch must invert deflate + every filter type
    and recover the exact raster. A 4x5 image covers all 5 filters
    (the builder cycles filter = row % 5)."""
    raster = bytes(range(4 * 5 * 3))
    payload = multimodal._png_encode(4, 5, raster)
    d = multimodal.decode_image(payload)
    assert (d["format"], d["width"], d["height"], d["bpp"]) == ("png", 4, 5, 24)
    assert d["n_pixel_bytes"] == 60
    assert d["pixels"] == raster


def test_decode_png_rejects_corruption():
    good = multimodal._png_bytes(3, "hello")
    # flip one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_image(bytes(bad))
    # truncation -> missing IEND / truncated chunk
    with pytest.raises(ValueError):
        multimodal.decode_image(good[:-8])


def test_decode_png_rejects_unsupported_shapes():
    """Palette/16-bit/interlaced are declared NotImplementedError,
    not silent garbage."""
    import zlib as _zlib

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (_zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    def png_with_ihdr(bit_depth, color_type, interlace):
        ihdr = (
            (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
            + bytes([bit_depth, color_type, 0, 0, interlace])
        )
        return (
            multimodal._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(b"\x00\x00\x00\x00"))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="color type 3"):
        multimodal.decode_image(png_with_ihdr(8, 3, 0))  # palette
    with pytest.raises(NotImplementedError, match="bit depth 16"):
        multimodal.decode_image(png_with_ihdr(16, 2, 0))
    with pytest.raises(NotImplementedError, match="interlaced"):
        multimodal.decode_image(png_with_ihdr(8, 2, 1))


def test_decode_pnm_rejects_crlf_separator():
    """A PNM writer emitting \\r\\n after maxval would shift the
    raster by one byte; such files are rejected, never mis-decoded."""
    good = multimodal._ppm_bytes(1, "x")
    assert good[:2] == b"P6"
    bad = good.replace(b"255\n", b"255ZX", 1)  # non-whitespace separator
    with pytest.raises(ValueError, match="whitespace"):
        multimodal.decode_image(bad)


from hypothesis import given as _given, settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402


@_settings(max_examples=40, deadline=None)
@_given(w=_st.integers(1, 8), h=_st.integers(1, 7), seed=_st.binary(min_size=1, max_size=48))
def test_decode_png_roundtrip_property(w, h, seed):
    """Encode→decode round-trip for arbitrary dimensions and pixel
    content through real deflate + cycling filters."""
    raster = (seed * (w * h * 3 // len(seed) + 1))[: w * h * 3]
    d = multimodal.decode_image(multimodal._png_encode(w, h, raster))
    assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
    assert d["pixels"] == raster


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


# ------------------------------------------------- baseline JPEG

def test_decode_jpeg_flat_roundtrips_exactly():
    """A flat-color image is DC-only after the DCT; with fine
    quantization the round trip is EXACT — pinning Huffman tables,
    zigzag, quantization, and the IDCT path all at once (any error
    in any of them produces wildly wrong pixels, not an off-by-one)."""
    import numpy as np

    from fdblog2clickhouse_spark.operators.jpeg import encode_jpeg

    w, h = 16, 16
    rgb = bytes([120, 60, 200] * (w * h))
    d = multimodal.decode_image(encode_jpeg(w, h, rgb, quality_scale=4))
    assert (d["format"], d["width"], d["height"], d["bpp"]) == ("jpeg", w, h, 24)
    assert d["n_pixel_bytes"] == w * h * 3
    a = np.frombuffer(rgb, np.uint8).astype(int)
    b = np.frombuffer(d["pixels"], np.uint8).astype(int)
    assert np.abs(a - b).max() == 0


def test_decode_jpeg_lossy_roundtrip_bounded():
    """Random noise is JPEG's worst case; at fine quantization the
    reconstruction error must stay small and structured (a decoder
    bug — wrong zigzag, bad EXTEND, broken bit reader — produces
    errors near 255, not near 4). Non-multiple-of-8 dims exercise
    edge-block cropping; a restart interval exercises RSTn handling
    and DC-predictor resets."""
    import numpy as np

    from fdblog2clickhouse_spark.operators.jpeg import encode_jpeg

    rng = np.random.RandomState(42)
    w, h = 24, 17
    raster = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    d = multimodal.decode_image(
        encode_jpeg(w, h, raster, quality_scale=8, restart_interval=2)
    )
    assert (d["width"], d["height"]) == (w, h)
    a = np.frombuffer(raster, np.uint8).astype(int)
    b = np.frombuffer(d["pixels"], np.uint8).astype(int)
    assert np.abs(a - b).mean() < 6.0
    assert np.abs(a - b).max() < 48


def test_decode_jpeg_gradient_smooth():
    import numpy as np

    from fdblog2clickhouse_spark.operators.jpeg import encode_jpeg

    w, h = 32, 16
    img = np.zeros((h, w, 3), np.uint8)
    for x in range(w):
        img[:, x, :] = int(x * 255 / (w - 1))
    d = multimodal.decode_image(encode_jpeg(w, h, img.tobytes(), quality_scale=4))
    b = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(img.astype(int) - b).mean() < 1.5


def test_decode_jpeg_rejects_nonbaseline_and_corrupt():
    import struct as _struct

    from fdblog2clickhouse_spark.operators.jpeg import encode_jpeg

    good = encode_jpeg(8, 8, bytes(8 * 8 * 3))
    # flip SOF0 -> SOF2 (progressive) in the marker stream
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        multimodal.decode_image(prog)
    # truncation mid-scan: bit reader runs off the end — the module
    # contract says structural corruption is ALWAYS ValueError (raw
    # IndexError would kill the Spark task unclassified)
    with pytest.raises(ValueError):
        multimodal.decode_image(good[: len(good) // 2])
    # truncation inside a table segment, before any entropy data
    with pytest.raises(ValueError):
        multimodal.decode_image(good[:24])
    # not a JPEG at all (also not any other known container)
    with pytest.raises((ValueError, NotImplementedError)):
        multimodal.decode_image(b"\xff\xd8\x00" + b"\x00" * 64)


def test_decode_jpeg_rejects_noninterleaved_scan():
    """A spec-legal baseline file with one scan per component (ns <
    frame component count) is declared out of scope — clean
    NotImplementedError, not a KeyError mid-scan."""
    import struct as _struct

    from fdblog2clickhouse_spark.operators.jpeg import decode_jpeg

    sof = _struct.pack(
        ">HBHHB", 17, 8, 8, 8, 3
    ) + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    sos = _struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    payload = (
        b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xda" + sos + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(payload)


def test_decode_jpeg_rejects_scan_order_mismatch():
    """Interleaved scan listing components in non-frame order is
    non-conforming (T.81 B.2.3) and must raise, not decode garbage."""
    import struct as _struct

    from fdblog2clickhouse_spark.operators.jpeg import decode_jpeg

    sof = _struct.pack(
        ">HBHHB", 17, 8, 8, 8, 3
    ) + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    sos = _struct.pack(">HB", 12, 3) + bytes(
        [3, 0x11, 2, 0x11, 1, 0x00, 0, 63, 0]
    )
    payload = (
        b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xda" + sos + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="scan component order"):
        decode_jpeg(payload)


@_settings(max_examples=15, deadline=None)
@_given(
    w=_st.integers(1, 20),
    h=_st.integers(1, 20),
    seed=_st.integers(0, 2**31 - 1),
)
def test_decode_jpeg_roundtrip_property(w, h, seed):
    """Arbitrary dimensions (including non-multiples of 8 and 1-pixel
    edges) and random content: the decoded raster must have the right
    shape and bounded reconstruction error."""
    import numpy as np

    from fdblog2clickhouse_spark.operators.jpeg import encode_jpeg

    rng = np.random.RandomState(seed)
    # smooth-ish content (random low-res upsampled) — JPEG's design
    # domain, keeps the error bound meaningfully tight
    small = rng.randint(0, 256, size=(-(-h // 4), -(-w // 4), 3))
    img = np.kron(small, np.ones((4, 4, 1)))[:h, :w, :].astype(np.uint8)
    d = multimodal.decode_image(
        encode_jpeg(w, h, img.tobytes(), quality_scale=8)
    )
    assert (d["width"], d["height"], d["n_pixel_bytes"]) == (w, h, w * h * 3)
    b = np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(img.astype(int) - b).mean() < 8.0


# --------------------------------------------------- WAV (audio)

def test_decode_wav_real_values():
    """Hand-assembled PCM WAV (with an extra LIST chunk the walker
    must skip) decodes to exact header fields and PCM bytes."""
    pcm = bytes(range(16))  # 4 frames, stereo 16-bit
    fmt = (
        (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"LIST" + (4).to_bytes(4, "little") + b"INFO"  # skipped
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    d = multimodal.decode_audio(b"RIFF" + len(chunks).to_bytes(4, "little") + chunks)
    assert d["format"] == "wav"
    assert (d["channels"], d["sample_rate"], d["bits"]) == (2, 8000, 16)
    assert d["n_frames"] == 4
    assert d["duration_us"] == 4 * 1_000_000 // 8000
    assert d["pcm"] == pcm


def test_decode_wav_rejects_corruption_and_nonpcm():
    good = multimodal._wav_bytes(5, "hello")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_audio(good[:-1])
    with pytest.raises(ValueError, match="RIFF"):
        multimodal.decode_audio(b"\x00" * 64)
    # flip format code 1 -> 3 (IEEE float): declared NotImplementedError
    bad = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    bad[fmt_at] = 3
    with pytest.raises(NotImplementedError, match="non-PCM"):
        multimodal.decode_audio(bytes(bad))
    # inconsistent block_align: structural corruption
    bad = bytearray(good)
    bad[fmt_at + 12] = 99
    with pytest.raises(ValueError, match="block_align"):
        multimodal.decode_audio(bytes(bad))


@_settings(max_examples=40, deadline=None)
@_given(
    channels=_st.integers(1, 4),
    rate=_st.integers(1, 96000),
    n=_st.integers(0, 64),
    seed=_st.binary(min_size=1, max_size=32),
)
def test_decode_wav_roundtrip_property(channels, rate, n, seed):
    pcm = (seed * (n * channels * 2 // len(seed) + 1))[: n * channels * 2]
    block = channels * 2
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = (
        b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    d = multimodal.decode_audio(
        b"RIFF" + len(chunks).to_bytes(4, "little") + chunks
    )
    assert (d["channels"], d["sample_rate"], d["n_frames"]) == (channels, rate, n)
    assert d["pcm"] == pcm


def test_audio_decode_oracle_parity(spark, sf_oracle):
    df = multimodal.multimodal_audio_decode(spark, sf_oracle)
    compare(df, multimodal.ORACLE["multimodal_audio_decode"], sf_oracle)


# ------------------------------------------------------- GIF codec

def test_gif_roundtrip_small_and_large():
    """Palette-lossless round trips: tiny rasters (the operator's
    payloads) and a large repetitive raster that forces real LZW
    dictionary growth through multiple code widths."""
    import hashlib

    from fdblog2clickhouse_spark.operators.gif import decode_gif, encode_gif

    for w, h in [(1, 1), (4, 3), (2, 3)]:
        raster = (hashlib.md5(f"{w}x{h}".encode()).digest() * 3)[: w * h * 3]
        d = decode_gif(encode_gif(w, h, raster))
        assert (d["format"], d["width"], d["height"], d["bpp"]) == ("gif", w, h, 24)
        assert d["pixels"] == raster
    big = bytes(range(0, 240, 3)) * 300  # 80 colors, 8000 px, heavy repeats
    d = decode_gif(encode_gif(100, 80, big))
    assert d["pixels"] == big


def test_gif_skips_extensions_and_rejects_interlace():
    import pytest as _pytest

    from fdblog2clickhouse_spark.operators.gif import decode_gif, encode_gif

    g = encode_gif(3, 2, bytes(range(18)))
    i = g.index(b"\x2c")
    # splice a Graphic Control Extension before the frame
    with_ext = g[:i] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + g[i:]
    assert decode_gif(with_ext)["pixels"] == bytes(range(18))
    # flip the interlace bit in the image descriptor
    interlaced = bytearray(g)
    interlaced[i + 9] |= 0x40
    with _pytest.raises(NotImplementedError):
        decode_gif(bytes(interlaced))


def test_gif_truncated_stream_raises():
    """LZW carries no checksum (a bit-flip can decode to wrong
    pixels), but a TRUNCATED stream must fail loudly: fewer decoded
    indices than the frame declares."""
    import pytest as _pytest

    from fdblog2clickhouse_spark.operators.gif import decode_gif, encode_gif

    g = encode_gif(4, 3, bytes(range(36)))
    mcs_at = g.index(b"\x2c") + 10  # descriptor + packed byte
    truncated = g[: mcs_at + 1] + b"\x00\x3b"  # no data sub-blocks
    with _pytest.raises(ValueError, match="shorter than frame"):
        decode_gif(truncated)


def test_gif_truncated_file_raises_valueerror_everywhere():
    """ADVICE r9: the block walker must surface truncation at ANY cut
    point as the module's documented ValueError contract — never
    IndexError/struct.error. Cut a valid GIF at every byte offset and
    require each failure (if any) to be ValueError or the declared
    NotImplementedError scope gates."""
    import pytest as _pytest

    from fdblog2clickhouse_spark.operators.gif import decode_gif, encode_gif

    g = encode_gif(4, 3, bytes(range(36)))
    for cut in range(len(g)):
        try:
            decode_gif(g[:cut])
        except ValueError:
            pass  # the contract
        except NotImplementedError:
            pass  # declared scope gate (can't trigger here, but allowed)
        # anything else (IndexError, struct.error) propagates = fail


def test_gif_animation_roundtrip_and_frames_op(spark, sf_oracle):
    """Animated GIF: per-frame local palettes + extension blocks
    round-trip losslessly; the frames operator hash-matches its
    closed-form oracle."""
    import hashlib

    from fdblog2clickhouse_spark.operators import multimodal
    from fdblog2clickhouse_spark.operators.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif_animation,
    )
    from tests.oracle import compare

    frames = [(hashlib.md5(f"f{k}".encode()).digest() * 3)[:36] for k in range(5)]
    g = encode_gif_animation(4, 3, frames)
    d = decode_gif_frames(g)
    assert d["frames"] == frames
    assert decode_gif(g)["pixels"] == frames[0]  # still-decode = frame 1

    compare(
        multimodal.multimodal_gif_frames(spark, sf_oracle),
        multimodal._GIF_FRAMES_SQL,
        sf_oracle,
    )


def test_gif_lzw_dictionary_saturation():
    """Direct LZW round trip through dictionary SATURATION: a
    pseudo-random 60k-symbol stream over 256 values drives the
    phrase dictionary past 4096 entries, exercising the 12-bit
    width cap and the no-more-assignments regime on both encoder
    and decoder (the whole-file fuzz never gets there — GIF frames
    in the operator are tiny). Also pins every min-code-size the
    palette builder can emit (2..8)."""
    import hashlib

    from fdblog2clickhouse_spark.operators.gif import _lzw_decode, _lzw_encode

    # deterministic pseudo-random bytes, no RNG state
    stream = b"".join(
        hashlib.md5(f"lzw|{i}".encode()).digest() for i in range(4000)
    )  # 64k symbols, ~full byte alphabet -> dictionary saturates
    enc = _lzw_encode(stream, 8)
    assert _lzw_decode(enc, 8) == stream
    # random bytes are incompressible — LZW correctly EXPANDS them
    # (9-12-bit codes per ~1 symbol); compression is asserted on a
    # repetitive stream instead
    assert len(enc) > len(stream)
    rep = (b"abcdefgh" * 8000)  # 64k symbols, highly repetitive
    enc_rep = _lzw_encode(rep, 8)
    assert _lzw_decode(enc_rep, 8) == rep
    assert len(enc_rep) < len(rep) // 10

    for mcs in range(2, 9):
        alphabet = 1 << mcs
        small = bytes(
            hashlib.md5(f"m{mcs}|{i}".encode()).digest()[0] % alphabet
            for i in range(3000)
        )
        assert _lzw_decode(_lzw_encode(small, mcs), mcs) == small
