"""Multimodal binary-column plumbing (SURVEY §2.6).

Image/audio/video payloads are opaque `binary` columns with typed
metadata — the Spark-side schema, partitioning, and Arrow/Pandas-UDF
batch shapes are real and tested. Image decode is REAL for six
formats with zero codec libraries (BMP, binary PNM, uncompressed
TGA, PNG via stdlib zlib + the five scanline filters, GIF via the
LZW codec in operators/gif.py, and baseline JPEG via a full T.81
implementation in operators/jpeg.py); only containers outside these
(WebP/TIFF, non-baseline JPEG modes, interlaced PNG/GIF) are
stubbed behind a PIL import-try so the pipeline shape is
production-true.

Deterministic fake payloads are derived from `documents` (md5-based
bytes, varying length by modality) so the metadata path is
oracle-checkable and the chunker has real bytes to move through
mapInPandas.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.hashing import h32
from ..sources.tables import table

try:  # real decoders are not available in this container
    from PIL import Image  # noqa: F401

    HAVE_IMAGE_DECODER = True
except ImportError:
    HAVE_IMAGE_DECODER = False

_CHUNK_BYTES = 16


def decode_image(payload: bytes) -> dict:
    """Decode an image payload.

    SIX formats are decoded for real with zero codec libraries —
    BMP (BITMAPINFOHEADER little-endian arithmetic), binary PNM
    (P6/P5 ASCII header + raster), uncompressed TGA (fixed 18-byte
    header), PNG (stdlib zlib inflate + the five scanline filters,
    8-bit RGB/RGBA non-interlaced), GIF (variable-width LSB-first
    LZW + palette resolution, extension skipping — operators/gif.py)
    and baseline JPEG (full T.81 sequential DCT: Huffman entropy
    decode, dequant, IDCT, YCbCr conversion, 4:2:0/4:2:2
    upsampling, restart intervals — operators/jpeg.py) — so the
    decode path is exercised end-to-end in this container.
    Containers outside these (WebP/TIFF/...), non-baseline JPEG
    modes, and interlaced PNG/GIF require an image library that is
    not baked in; that fall-through is the one remaining stub (the
    surrounding plumbing — schema, batching, partitioning — is real
    either way)."""
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if len(payload) >= 54 and payload[:2] == b"BM":
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if compression != 0:
            raise NotImplementedError("compressed BMP requires a codec")
        pixel_offset = int.from_bytes(payload[10:14], "little")
        # Header fields are untrusted: validate against the actual
        # payload before returning, so a truncated/malformed 'BM'
        # buffer raises instead of yielding an inconsistent dict
        # (n_pixel_bytes != len(pixels)).
        if width <= 0:
            raise ValueError(f"BMP declares non-positive width {width}")
        if not 54 <= pixel_offset <= len(payload):
            raise ValueError(f"BMP pixel offset {pixel_offset} outside payload")
        # rows are padded to 4-byte boundaries
        row_bytes = ((width * bpp + 31) // 32) * 4
        n_pixel_bytes = row_bytes * abs(height)
        if len(payload) - pixel_offset < n_pixel_bytes:
            raise ValueError(
                f"BMP declares {n_pixel_bytes} raster bytes but only "
                f"{len(payload) - pixel_offset} present after offset"
            )
        return {
            "format": "bmp",
            "width": width,
            "height": abs(height),
            "bpp": bpp,
            "n_pixel_bytes": n_pixel_bytes,
            "pixels": payload[pixel_offset : pixel_offset + n_pixel_bytes],
        }
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    tga = _try_decode_tga(payload)
    if tga is not None:
        return tga
    if not HAVE_IMAGE_DECODER:
        raise NotImplementedError(
            "unrecognized image container (GIF/WebP/TIFF/...) requires "
            "PIL; install an image codec to enable"
        )
    raise NotImplementedError("wire to Image.open(BytesIO(payload)) when enabled")


# ----------------------------------------------------- PNG decode

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9, public ISO 15948)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode: chunk walk with CRC verification,
    zlib inflate of the concatenated IDAT stream, then the five
    scanline filters (None/Sub/Up/Average/Paeth) undone row by row.
    Supports 8-bit truecolor (color type 2, RGB) and truecolor+alpha
    (6, RGBA), non-interlaced — the shapes training corpora actually
    carry. Palette/grayscale/16-bit/interlaced raise
    NotImplementedError; structural corruption (bad CRC, truncated
    chunk, raster-size mismatch) raises ValueError. Implemented from
    the public PNG spec (ISO 15948 / RFC 2083); per-byte loops are
    fine here because payloads are decoded inside Arrow-batched
    mapInPandas workers — a production path would vectorize the
    filter pass with numpy, changing nothing Spark-side."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG signature")
    i = 8
    width = height = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    seen_iend = False
    while i + 12 <= len(payload):
        clen = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if len(data) < clen or i + 12 + clen > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        crc = int.from_bytes(payload[i + 8 + clen : i + 12 + clen], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            if clen != 13:
                raise ValueError("PNG IHDR length != 13")
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type = data[8], data[9]
            compression, filter_method, interlace = data[10], data[11], data[12]
            if compression != 0 or filter_method != 0:
                raise ValueError("unknown PNG compression/filter method")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        i += 12 + clen
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not seen_iend:
        raise ValueError("PNG missing IEND")
    if width <= 0 or height <= 0:
        raise ValueError(f"PNG declares non-positive dimensions {width}x{height}")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG is not supported")
    if bit_depth != 8 or color_type not in (2, 6):
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA PNG supported "
            f"(bit depth {bit_depth}, color type {color_type})"
        )
    nchan = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT stream corrupt: {e}") from None
    stride = width * nchan
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG raster is {len(raw)} bytes, expected {(stride + 1) * height}"
        )
    out = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for k in range(nchan, stride):
                row[k] = (row[k] + row[k - nchan]) & 255
        elif ftype == 2:  # Up
            for k in range(stride):
                row[k] = (row[k] + prev[k]) & 255
        elif ftype == 3:  # Average
            for k in range(stride):
                a = row[k - nchan] if k >= nchan else 0
                row[k] = (row[k] + ((a + prev[k]) >> 1)) & 255
        elif ftype == 4:  # Paeth
            for k in range(stride):
                a = row[k - nchan] if k >= nchan else 0
                c = prev[k - nchan] if k >= nchan else 0
                row[k] = (row[k] + _paeth(a, prev[k], c)) & 255
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = row
    return {
        "format": "png",
        "width": width,
        "height": height,
        "bpp": 8 * nchan,
        "n_pixel_bytes": stride * height,
        "pixels": bytes(out),
    }


def _decode_pnm(payload: bytes) -> dict:
    """Binary PPM (P6, 24-bpp RGB) / PGM (P5, 8-bpp grayscale): an
    ASCII header (magic, width, height, maxval; '#' comments run to
    end-of-line) followed by the raw raster — decodable with pure
    byte arithmetic, no codec."""
    magic = payload[:2]
    i, tokens = 2, []
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        tokens.append(payload[i:j])
        i = j
    # Exactly ONE whitespace byte separates maxval from the raster
    # (PNM spec). Verify it IS whitespace — a writer that emitted
    # '\r\n' here would otherwise silently shift every pixel by one
    # byte; such files are rejected as malformed (multi-byte
    # separators are outside the spec and unsupported).
    if i >= len(payload) or not payload[i : i + 1].isspace():
        raise ValueError("PNM header not terminated by a whitespace byte")
    i += 1
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError as e:
        raise ValueError(f"non-numeric PNM header token: {tokens}") from e
    if width <= 0 or height <= 0:
        raise ValueError(f"PNM declares non-positive dimensions {width}x{height}")
    if maxval != 255:
        raise NotImplementedError("only 8-bit-per-sample PNM is supported")
    bands = 3 if magic == b"P6" else 1
    n_pixel_bytes = width * height * bands
    if len(payload) - i < n_pixel_bytes:
        raise ValueError(
            f"PNM declares {n_pixel_bytes} raster bytes but only "
            f"{len(payload) - i} present after header"
        )
    return {
        "format": "ppm" if magic == b"P6" else "pgm",
        "width": width,
        "height": height,
        "bpp": 8 * bands,
        "n_pixel_bytes": n_pixel_bytes,
        "pixels": payload[i : i + n_pixel_bytes],
    }


def _try_decode_tga(payload: bytes) -> dict | None:
    """Uncompressed truecolor (type 2) / grayscale (type 3) TGA. TGA
    has no leading magic, so this validates the fixed 18-byte header
    instead and returns None when the bytes cannot be a supported TGA
    (the caller then falls through to the codec-required stub). A
    header that IS structurally TGA but whose declared raster exceeds
    the payload raises — that's a corrupt file, not a different
    format."""
    if len(payload) < 18:
        return None
    id_len, colormap_type, image_type = payload[0], payload[1], payload[2]
    if colormap_type != 0 or image_type not in (2, 3):
        return None
    width = int.from_bytes(payload[12:14], "little")
    height = int.from_bytes(payload[14:16], "little")
    bpp = payload[16]
    if width == 0 or height == 0 or bpp not in (8, 24, 32):
        return None
    if image_type == 3 and bpp != 8:
        return None
    offset = 18 + id_len
    n_pixel_bytes = width * height * (bpp // 8)
    if len(payload) - offset < n_pixel_bytes:
        raise ValueError(
            f"TGA declares {n_pixel_bytes} raster bytes but only "
            f"{max(0, len(payload) - offset)} present after header"
        )
    return {
        "format": "tga",
        "width": width,
        "height": height,
        "bpp": bpp,
        "n_pixel_bytes": n_pixel_bytes,
        "pixels": payload[offset : offset + n_pixel_bytes],
    }


# ------------------------------------------------ payload synthesis

def with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic fake binary payload + modality.
    payload = unhex(repeat(md5(text), 1 + doc_id % 3)) → 16/32/48
    bytes; modality cycles image/audio/video."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.unhex(
            F.repeat(F.md5(F.col("text")), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
        ).alias("payload"),
        F.col("text"),
    )


# --------------------------------------------- multimodal_metadata

def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction over the opaque payload: length,
    content checksum, modality-specific fake dimensions. Pure column
    algebra (JVM-side); the decode that would fill real dimensions is
    the stubbed step."""
    p = with_payload(spark, sf_dir)
    return p.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("payload_len"),
        F.md5(F.hex("payload")).alias("payload_md5"),
        F.when(F.col("media_type") == "image", (h32(F.col("text")) % 1920).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(F.col("media_type") == "image", (h32(F.concat(F.lit("h|"), F.col("text"))) % 1080).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(
            F.col("media_type") == "audio",
            (F.lit(8000) + h32(F.concat(F.lit("sr|"), F.col("text"))) % 40000).cast("int"),
        )
        .otherwise(F.lit(None).cast("int"))
        .alias("sample_rate"),
    )


_METADATA_SQL = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         unhex(repeat(md5(text), CAST(1 + doc_id % 3 AS INT))) AS payload,
         text
  FROM documents
)
SELECT doc_id, media_type,
       CAST(octet_length(payload) AS INT) AS payload_len,
       md5(hex(payload)) AS payload_md5,
       CASE WHEN media_type = 'image'
            THEN CAST((('0x' || substr(md5(text), 1, 8))::BIGINT) % 1920 AS INT)
            ELSE NULL END AS width,
       CASE WHEN media_type = 'image'
            THEN CAST((('0x' || substr(md5('h|' || text), 1, 8))::BIGINT) % 1080 AS INT)
            ELSE NULL END AS height,
       CASE WHEN media_type = 'audio'
            THEN CAST(8000 + (('0x' || substr(md5('sr|' || text), 1, 8))::BIGINT) % 40000 AS INT)
            ELSE NULL END AS sample_rate
FROM p
"""


# ------------------------------------------------ multimodal_chunk

_CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_len", IntegerType()),
        StructField("chunk_hex", StringType()),
    ]
)


def _chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched chunker: fixed-size byte windows per payload —
    the frame-sampling / audio-windowing analog. Runs per-partition;
    no driver involvement. Chunks are emitted as uppercase hex
    (lossless) rather than raw binary: bytes vs bytearray round-trips
    are not hash-stable across engines, hex strings are."""
    import binascii

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "media_type": [],
            "chunk_idx": [],
            "chunk_len": [],
            "chunk_hex": [],
        }
        for doc_id, media_type, payload in zip(
            pdf["doc_id"], pdf["media_type"], pdf["payload"]
        ):
            b = bytes(payload)
            for idx in range(0, len(b), _CHUNK_BYTES):
                chunk = b[idx : idx + _CHUNK_BYTES]
                out["doc_id"].append(doc_id)
                out["media_type"].append(media_type)
                out["chunk_idx"].append(idx // _CHUNK_BYTES)
                out["chunk_len"].append(len(chunk))
                out["chunk_hex"].append(binascii.hexlify(chunk).upper().decode())
        yield pd.DataFrame(out)


def multimodal_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas chunking of binary payloads, ORACLE-checked: the
    synthetic payload is unhex(repeat(md5(text), k)), so every 16-byte
    chunk is exactly unhex(md5(text)) and the oracle reconstructs each
    chunk's hex in closed form (same derivation as
    multimodal_frame_sample)."""
    p = with_payload(spark, sf_dir).select("doc_id", "media_type", "payload")
    return p.mapInPandas(_chunk_batches, schema=_CHUNK_SCHEMA)


# payload = unhex(repeat(md5(text), 1 + doc_id % 3)) and the chunk
# width equals one md5 digest (16 bytes), so chunk i (i < k) is the
# digest itself: chunk_hex = upper(md5(text)).
_CHUNK_SQL = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(1 + doc_id % 3 AS INT) AS n_chunks,
         upper(md5(text)) AS chunk_hex
  FROM documents
)
SELECT doc_id, media_type,
       CAST(i AS INT) AS chunk_idx,
       CAST({_CHUNK_BYTES} AS INT) AS chunk_len,
       chunk_hex
FROM p, LATERAL unnest(generate_series(0, n_chunks - 1)) AS t(i)
"""


# ---------------------------------------- multimodal_feature_extract

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("entropy_micro", LongType()),
        StructField("distinct_bytes", IntegerType()),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over raw payload bytes —
    numpy histogram + entropy per payload, vectorized per batch. This
    is the REAL feature path (unlike decode, nothing to stub: bytes
    math needs no media codec); swap the body for a model/codec call
    and the Spark plumbing is unchanged.

    Cross-engine exactness: byte_mean is an integer sum divided by a
    power-of-two-reachable quotient (the true value s/16 is exactly
    representable, so IEEE division lands on it from either engine's
    formulation). Entropy is a sum of transcendental terms whose
    FP ordering differs between engines, so it is emitted floor-scaled
    to integer micro-bits — the repo's exact-value convention
    (functions/hashing.py) applied to a UDF output."""
    import numpy as np

    for pdf in batches:
        out = {
            "doc_id": [], "media_type": [], "n_bytes": [],
            "byte_mean": [], "entropy_micro": [], "distinct_bytes": [],
        }
        for doc_id, media_type, payload in zip(
            pdf["doc_id"], pdf["media_type"], pdf["payload"]
        ):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            hist = np.bincount(b, minlength=256)
            p = hist[hist > 0] / float(b.size)
            ent = float(-(p * np.log2(p)).sum())
            out["doc_id"].append(doc_id)
            out["media_type"].append(media_type)
            out["n_bytes"].append(int(b.size))
            out["byte_mean"].append(float(b.mean()))
            out["entropy_micro"].append(int(np.floor(ent * 1_000_000)))
            out["distinct_bytes"].append(int((hist > 0).sum()))
        yield pd.DataFrame(out)


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over the binary column,
    ORACLE-checked: the payload is k repeats of the md5(text) digest,
    so the byte histogram equals k× the digest's histogram and every
    feature is reconstructable from the digest's hex in closed form."""
    p = with_payload(spark, sf_dir).select("doc_id", "media_type", "payload")
    return p.mapInPandas(_feature_batches, schema=_FEATURE_SCHEMA)


# The repeated-digest structure makes the oracle exact: with
# per-digest byte counts c (Σc = 16), the full-payload frequencies are
# (k·c)/(16k) = c/16 bitwise (true quotient exactly representable), so
# mean and entropy are computed from the 16 digest bytes alone.
_FEATURE_SQL = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         md5(text) AS hx,
         CAST(1 + doc_id % 3 AS INT) AS k
  FROM documents
),
bytes AS (
  SELECT doc_id, media_type, k,
         ('0x' || substr(hx, 2 * i - 1, 2))::INT AS byte
  FROM p, LATERAL unnest(generate_series(1, 16)) AS t(i)
),
counts AS (
  SELECT doc_id, media_type, k, byte, COUNT(*) AS c
  FROM bytes GROUP BY doc_id, media_type, k, byte
)
SELECT doc_id, media_type,
       CAST(16 * k AS INT) AS n_bytes,
       SUM(byte * c) / 16.0 AS byte_mean,
       CAST(floor(-SUM((c / 16.0) * log2(c / 16.0)) * 1000000) AS BIGINT)
         AS entropy_micro,
       CAST(COUNT(*) AS INT) AS distinct_bytes
FROM counts
GROUP BY doc_id, media_type, k
"""


# ---------------------------------------------- multimodal_decode

def _raster(text: str, npix: int) -> bytes:
    """Deterministic raster: md5(text) digest repeated to npix bytes —
    reconstructable in closed-form SQL, which is what makes every
    decoded pixel fingerprint oracle-checkable."""
    import hashlib

    digest = hashlib.md5(text.encode()).digest()
    return (digest * (npix // 16 + 1))[:npix]


def _bmp_bytes(doc_id: int, text: str) -> bytes:
    """A REAL uncompressed 24-bpp BMP, deterministically derived from
    (doc_id, text): header fields from doc_id, pixel bytes from the
    md5(text) digest repeated to fill the padded raster."""
    w = 1 + doc_id % 4
    h = 1 + doc_id % 3
    bpp = 24
    row = ((w * bpp + 31) // 32) * 4  # 4-byte row padding
    npix = row * h
    header = (
        b"BM"
        + (54 + npix).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
    )
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB, uncompressed
        + npix.to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + info + _raster(text, npix)


def _ppm_bytes(doc_id: int, text: str) -> bytes:
    """A REAL binary PPM (P6, 24-bpp): ASCII header + unpadded RGB
    raster, dimensions from doc_id, pixels from md5(text)."""
    w = 1 + doc_id % 4
    h = 1 + doc_id % 3
    return b"P6\n%d %d\n255\n" % (w, h) + _raster(text, w * h * 3)


def _tga_bytes(doc_id: int, text: str) -> bytes:
    """A REAL uncompressed truecolor TGA (type 2, 24-bpp): fixed
    18-byte header + unpadded BGR raster."""
    w = 1 + doc_id % 4
    h = 1 + doc_id % 3
    header = (
        bytes([0, 0, 2])  # no image id, no colormap, uncompressed truecolor
        + b"\x00" * 5  # colormap spec (unused)
        + b"\x00" * 4  # x/y origin
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([24, 0])  # bpp, descriptor
    )
    return header + _raster(text, w * h * 3)


def _png_encode(width: int, height: int, raster: bytes) -> bytes:
    """Assemble a REAL 8-bit RGB PNG from a raw raster. Scanline
    filter types cycle r % 5, so decoding one multi-row image
    exercises ALL FIVE filter reconstructions (None/Sub/Up/Average/
    Paeth) — the encoder applies each filter's forward transform and
    the decoder must invert it exactly."""
    nchan = 3
    stride = width * nchan
    if len(raster) != stride * height:
        raise ValueError("raster size does not match dimensions")
    filtered = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = raster[r * stride : (r + 1) * stride]
        f = r % 5
        filtered.append(f)
        if f == 0:
            enc = row
        elif f == 1:
            enc = bytes(
                (row[k] - (row[k - nchan] if k >= nchan else 0)) & 255
                for k in range(stride)
            )
        elif f == 2:
            enc = bytes((row[k] - prev[k]) & 255 for k in range(stride))
        elif f == 3:
            enc = bytes(
                (row[k] - (((row[k - nchan] if k >= nchan else 0) + prev[k]) >> 1))
                & 255
                for k in range(stride)
            )
        else:
            enc = bytes(
                (
                    row[k]
                    - _paeth(
                        row[k - nchan] if k >= nchan else 0,
                        prev[k],
                        prev[k - nchan] if k >= nchan else 0,
                    )
                )
                & 255
                for k in range(stride)
            )
        filtered += enc
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # 8-bit, truecolor, deflate, adaptive, none
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


def _png_bytes(doc_id: int, text: str) -> bytes:
    """A REAL 8-bit RGB PNG, deterministically derived from
    (doc_id, text) like the other builders; filters cycle per row."""
    w = 1 + doc_id % 4
    h = 1 + doc_id % 3
    return _png_encode(w, h, _raster(text, w * h * 3))


def _gif_bytes(doc_id: int, text: str) -> bytes:
    """A REAL single-frame GIF89a (LZW-compressed, palette built
    from the raster's distinct colors — ≤12 pixels, so palettization
    is lossless and the decode round-trips the exact raster)."""
    from .gif import encode_gif

    w = 1 + doc_id % 4
    h = 1 + doc_id % 3
    return encode_gif(w, h, _raster(text, w * h * 3))


# doc_id % 5 routes each document to one of the five real formats,
# so a single driver row exercises every codec-free decode branch —
# including the compressed PNG (zlib) and GIF (LZW) paths.
_FORMAT_BUILDERS = {
    0: _bmp_bytes, 1: _ppm_bytes, 2: _tga_bytes, 3: _png_bytes, 4: _gif_bytes,
}


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bpp", IntegerType()),
        StructField("n_pixel_bytes", IntegerType()),
        StructField("pixel_md5", StringType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import binascii
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "format": [], "width": [], "height": [],
            "bpp": [], "n_pixel_bytes": [], "pixel_md5": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            payload = _FORMAT_BUILDERS[int(doc_id) % 5](int(doc_id), text)
            d = decode_image(payload)  # the REAL (non-stub) path
            out["doc_id"].append(doc_id)
            out["format"].append(d["format"])
            out["width"].append(d["width"])
            out["height"].append(d["height"])
            out["bpp"].append(d["bpp"])
            out["n_pixel_bytes"].append(d["n_pixel_bytes"])
            out["pixel_md5"].append(
                hashlib.md5(binascii.hexlify(d["pixels"]).upper()).hexdigest()
            )
        yield pd.DataFrame(out)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image decode through Spark across FIVE
    container-decodable formats: each doc's deterministic payload
    (BMP / binary PPM / uncompressed TGA / zlib-compressed PNG /
    LZW-compressed GIF by doc_id % 5, headers + raster built per
    doc) is decoded by `decode_image`'s codec-free branches inside
    mapInPandas, and every recovered field — format, dimensions,
    bpp, raster size, pixel fingerprint — is ORACLE-checked in
    closed form (the PNG round-trips through real deflate + all five
    scanline filters, the GIF through real LZW + palette resolution,
    and both must reproduce the identical raster). This is the
    non-stub proof of the multimodal plumbing: swap a branch for a
    PIL/codec call and nothing about the Spark side changes."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


# format + width/height derive from doc_id; BMP rasters are 4-byte
# row-padded while PPM/TGA/PNG/GIF are exact w*h*3 (PNG's deflate +
# filters and GIF's LZW + palette round-trip back to the same raw
# raster); pixels are md5(text) digests repeated and truncated, so
# the pixel fingerprint is md5 over a substring of repeated hex.
_DECODE_SQL = """
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 5 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
              WHEN 2 THEN 'tga' WHEN 3 THEN 'png' ELSE 'gif' END AS format,
         CAST(1 + doc_id % 4 AS INT) AS width,
         CAST(1 + doc_id % 3 AS INT) AS height,
         md5(text) AS hx
  FROM documents
),
q AS (
  SELECT doc_id, format, width, height, hx,
         CAST(CASE WHEN format = 'bmp'
                   THEN ((width * 24 + 31) // 32) * 4 * height
                   ELSE width * height * 3 END AS INT) AS n_pixel_bytes
  FROM p
)
SELECT doc_id, format, width, height, CAST(24 AS INT) AS bpp, n_pixel_bytes,
       md5(upper(substr(repeat(hx, n_pixel_bytes // 16 + 1), 1, 2 * n_pixel_bytes)))
         AS pixel_md5
FROM q
"""


# ----------------------------------------------------- WAV decode

def decode_audio(payload: bytes) -> dict:
    """REAL audio container decode: RIFF/WAVE with PCM (format 1),
    8/16-bit — pure byte arithmetic, no codec library. Walks the
    chunk list (tolerating extra chunks like LIST/fact), validates
    the fmt chunk's internal consistency (block_align, byte_rate)
    and the data chunk against the actual payload; compressed
    formats (MP3/AAC/IEEE-float WAV) raise NotImplementedError,
    structural corruption raises ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        clen = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "byte_rate": int.from_bytes(body[8:12], "little"),
                "block_align": int.from_bytes(body[12:14], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt["audio_format"] != 1:
        raise NotImplementedError(
            f"non-PCM WAV (format {fmt['audio_format']}) requires a codec"
        )
    if fmt["bits"] not in (8, 16):
        raise NotImplementedError(f"{fmt['bits']}-bit PCM not supported")
    if fmt["channels"] < 1 or fmt["sample_rate"] <= 0:
        raise ValueError("WAV declares invalid channels/sample_rate")
    expect_align = fmt["channels"] * fmt["bits"] // 8
    if fmt["block_align"] != expect_align:
        raise ValueError(
            f"block_align {fmt['block_align']} != channels*bits/8 {expect_align}"
        )
    if fmt["byte_rate"] != fmt["sample_rate"] * expect_align:
        raise ValueError("byte_rate inconsistent with rate*block_align")
    if len(data) % expect_align != 0:
        raise ValueError("data chunk is not a whole number of frames")
    n_frames = len(data) // expect_align
    return {
        "format": "wav",
        "channels": fmt["channels"],
        "sample_rate": fmt["sample_rate"],
        "bits": fmt["bits"],
        "n_frames": n_frames,
        "duration_us": n_frames * 1_000_000 // fmt["sample_rate"],
        "pcm": data,
    }


def _wav_bytes(doc_id: int, text: str) -> bytes:
    """A REAL PCM WAV deterministically derived from (doc_id, text):
    header fields from doc_id, sample bytes from the md5(text)
    digest repeated — the same closed-form-oracle construction as the
    image builders."""
    channels = 1 + doc_id % 2
    sample_rate = 8000 + (doc_id % 4) * 4000
    bits = 16
    n_frames = 64 + doc_id % 32
    block = channels * bits // 8
    pcm = _raster(text, n_frames * block)
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


_AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_us", LongType()),
        StructField("pcm_md5", StringType()),
    ]
)


def _audio_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import binascii
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "format": [], "channels": [], "sample_rate": [],
            "bits": [], "n_frames": [], "duration_us": [], "pcm_md5": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            d = decode_audio(_wav_bytes(int(doc_id), text))
            out["doc_id"].append(doc_id)
            out["format"].append(d["format"])
            out["channels"].append(d["channels"])
            out["sample_rate"].append(d["sample_rate"])
            out["bits"].append(d["bits"])
            out["n_frames"].append(d["n_frames"])
            out["duration_us"].append(d["duration_us"])
            out["pcm_md5"].append(
                hashlib.md5(binascii.hexlify(d["pcm"]).upper()).hexdigest()
            )
        yield pd.DataFrame(out)


def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL audio decode through Spark: each doc's
    deterministic PCM WAV (RIFF assembled per doc, chunk-validated)
    is decoded by `decode_audio` inside mapInPandas and every
    recovered field — container format, channels, sample rate, bit
    depth, frame count, integer duration, PCM fingerprint — is
    ORACLE-checked in closed form. The audio sibling of
    `multimodal_decode`; swap the body for an MP3/AAC codec call and
    the Spark plumbing is unchanged."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_audio_decode_batches, schema=_AUDIO_DECODE_SCHEMA)


_AUDIO_DECODE_SQL = """
WITH p AS (
  SELECT doc_id,
         CAST(1 + doc_id % 2 AS INT) AS channels,
         CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
         CAST(64 + doc_id % 32 AS INT) AS n_frames,
         md5(text) AS hx
  FROM documents
),
q AS (
  SELECT doc_id, channels, sample_rate, n_frames, hx,
         n_frames * channels * 2 AS n_pcm
  FROM p
)
SELECT doc_id, 'wav' AS format, channels, sample_rate,
       CAST(16 AS INT) AS bits, n_frames,
       CAST(n_frames AS BIGINT) * 1000000 // sample_rate AS duration_us,
       md5(upper(substr(repeat(hx, n_pcm // 16 + 1), 1, 2 * n_pcm)))
         AS pcm_md5
FROM q
"""


# --------------------------------------------- multimodal_decode_jpeg

_JPEG_ERR_BOUND = 16.0  # generous mean-abs-error slack (see docstring)

_DECODE_JPEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bpp", IntegerType()),
        StructField("n_pixel_bytes", IntegerType()),
        StructField("err_ok", IntegerType()),
    ]
)


def _decode_jpeg_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from .jpeg import decode_jpeg, encode_jpeg

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "format": [], "width": [], "height": [],
            "bpp": [], "n_pixel_bytes": [], "err_ok": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            w = 8 + (int(doc_id) % 3) * 4
            h = 8 + (int(doc_id) % 2) * 4
            raster = _raster(text, w * h * 3)
            d = decode_jpeg(encode_jpeg(w, h, raster, quality_scale=8))
            a = np.frombuffer(raster, np.uint8).astype(np.int64)
            b = np.frombuffer(d["pixels"], np.uint8).astype(np.int64)
            err = float(np.abs(a - b).mean())
            out["doc_id"].append(doc_id)
            out["format"].append(d["format"])
            out["width"].append(d["width"])
            out["height"].append(d["height"])
            out["bpp"].append(d["bpp"])
            out["n_pixel_bytes"].append(d["n_pixel_bytes"])
            out["err_ok"].append(int(err <= _JPEG_ERR_BOUND))
        yield pd.DataFrame(out)


def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LOSSY-codec decode path through Spark: every doc's
    deterministic raster is encoded to a REAL baseline JPEG and
    decoded back by the full T.81 pipeline (operators/jpeg.py)
    inside mapInPandas. JPEG loss means pixel bytes have no
    closed-form SQL oracle, so the oracle-checked surface is the
    part that IS closed-form — format/dimensions/bpp/raster size
    derive from doc_id — plus an `err_ok` flag asserting the
    reconstruction error stays under a slack bound of
    16 mean-abs-per-sample (typical measured error is ~3-6 at this
    quantization; a decoder bug — wrong zigzag, broken Huffman, bad
    IDCT — produces errors near 85, the mean |a-b| of independent
    uniform bytes, so the bound separates working from broken by an
    order of magnitude while being insensitive to float rounding).

    Runs over the deterministic doc_id % 5 == 0 SAMPLE (20%): a
    lossy-codec integrity audit is a sampled QA pass in a real
    pipeline — you spot-check codec health, you don't re-encode the
    corpus — and the pure-Python per-block codec (fine inside unit
    tests) would otherwise dominate the full-corpus sweep."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 5 == 0)
    )
    return d.mapInPandas(_decode_jpeg_batches, schema=_DECODE_JPEG_SCHEMA)


_DECODE_JPEG_SQL = """
SELECT doc_id,
       'jpeg' AS format,
       CAST(8 + (doc_id % 3) * 4 AS INT) AS width,
       CAST(8 + (doc_id % 2) * 4 AS INT) AS height,
       CAST(24 AS INT) AS bpp,
       CAST((8 + (doc_id % 3) * 4) * (8 + (doc_id % 2) * 4) * 3 AS INT)
         AS n_pixel_bytes,
       CAST(1 AS INT) AS err_ok
FROM documents
WHERE doc_id % 5 = 0
"""


# ------------------------------------------- multimodal_frame_sample

_FRAME_STRIDE = 2

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched stride sampling: keep every 2nd fixed-size frame
    and fingerprint it (md5 of the frame's uppercase hex — the same
    spelling SQL's md5(hex(...)) uses, which is what makes this
    Python path ORACLE-checkable, rare for a UDF operator)."""
    import binascii
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "media_type": [], "frame_idx": [], "frame_md5": [],
        }
        for doc_id, media_type, payload in zip(
            pdf["doc_id"], pdf["media_type"], pdf["payload"]
        ):
            b = bytes(payload)
            n_frames = len(b) // _CHUNK_BYTES
            for idx in range(0, n_frames, _FRAME_STRIDE):
                frame = b[idx * _CHUNK_BYTES : (idx + 1) * _CHUNK_BYTES]
                out["doc_id"].append(doc_id)
                out["media_type"].append(media_type)
                out["frame_idx"].append(idx)
                out["frame_md5"].append(
                    hashlib.md5(binascii.hexlify(frame).upper()).hexdigest()
                )
        yield pd.DataFrame(out)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the binary column: every 2nd 16-byte frame,
    fingerprinted. The video-frame-sampling analog with real Arrow
    batch plumbing; swap the stride/fingerprint body for a codec call
    and nothing else changes. At scale this runs where the bytes live
    (mapInPandas per partition, no shuffle at all)."""
    p = with_payload(spark, sf_dir).select("doc_id", "media_type", "payload")
    return p.mapInPandas(_frame_sample_batches, schema=_FRAME_SCHEMA)


# The synthetic payload is md5(text) bytes repeated (1 + doc_id % 3)
# times, so every 16-byte frame IS unhex(md5(text)) — the oracle
# reconstructs each sampled frame's fingerprint in closed form.
_FRAME_SAMPLE_SQL = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(1 + doc_id % 3 AS INT) AS n_frames,
         md5(upper(md5(text))) AS frame_md5
  FROM documents
)
SELECT doc_id, media_type,
       CAST(i AS INT) AS frame_idx,
       frame_md5
FROM p, LATERAL unnest(generate_series(0, n_frames - 1)) AS t(i)
WHERE i % {_FRAME_STRIDE} = 0
"""


# ------------------------------------------- multimodal_gif_frames

_GIF_FRAME_STRIDE = 2

_GIF_FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def _gif_frames_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import binascii
    import hashlib

    from .gif import decode_gif_frames, encode_gif_animation

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "n_frames": [], "frame_idx": [],
            "width": [], "height": [], "frame_md5": [],
        }
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            w = 1 + doc_id % 4
            h = 1 + doc_id % 3
            k = 2 + doc_id % 3
            payload = encode_gif_animation(
                w, h, [_raster(f"{text}|frame{i}", w * h * 3) for i in range(k)]
            )
            d = decode_gif_frames(payload)  # the REAL multi-frame decode
            for idx in range(0, len(d["frames"]), _GIF_FRAME_STRIDE):
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(d["frames"]))
                out["frame_idx"].append(idx)
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["frame_md5"].append(
                    hashlib.md5(
                        binascii.hexlify(d["frames"][idx]).upper()
                    ).hexdigest()
                )
        yield pd.DataFrame(out)


def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO-style frame sampling through a REAL multi-frame
    container: each doc becomes a (2 + doc_id % 3)-frame animated
    GIF (per-frame local palettes, Netscape loop + GCE extension
    blocks — the realistic layout), decoded frame-by-frame by the
    pure-stdlib LZW codec inside mapInPandas, with every 2nd frame
    fingerprinted. Unlike `multimodal_frame_sample` (byte-stride
    plumbing over opaque payloads — kept as the codec-free
    baseline), the frames here EXIST only after a real container
    decode; the oracle reconstructs each sampled frame's raster in
    closed form, so a single wrong pixel in LZW, palette resolution,
    or frame walking breaks the hash. Runs where the bytes live —
    no shuffle."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_gif_frames_batches, schema=_GIF_FRAMES_SCHEMA)


# frame rasters are md5(text || '|frame' || i) digests repeated to
# w*h*3 bytes (the _raster construction), so the sampled frame
# fingerprint is md5 over the repeated-hex substring — same closed
# form as _DECODE_SQL.
_GIF_FRAMES_SQL = f"""
WITH p AS (
  SELECT doc_id,
         CAST(1 + doc_id % 4 AS INT) AS width,
         CAST(1 + doc_id % 3 AS INT) AS height,
         CAST(2 + doc_id % 3 AS INT) AS n_frames,
         (1 + doc_id % 4) * (1 + doc_id % 3) * 3 AS npix
  FROM documents
)
SELECT doc_id, n_frames, CAST(i AS INT) AS frame_idx, width, height,
       md5(upper(substr(repeat(md5(d.text || '|frame' || i), npix // 16 + 1),
                        1, 2 * npix))) AS frame_md5
FROM p JOIN documents d USING (doc_id),
     LATERAL unnest(generate_series(0, n_frames - 1)) AS t(i)
WHERE i % {_GIF_FRAME_STRIDE} = 0
"""


QUERIES = {
    "multimodal_metadata": multimodal_metadata,
    "multimodal_chunk": multimodal_chunk,
    "multimodal_feature_extract": multimodal_feature_extract,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_gif_frames": multimodal_gif_frames,
    "multimodal_decode": multimodal_decode,
    "multimodal_decode_jpeg": multimodal_decode_jpeg,
    "multimodal_audio_decode": multimodal_audio_decode,
}

ORACLE = {
    "multimodal_metadata": _METADATA_SQL,
    "multimodal_chunk": _CHUNK_SQL,
    "multimodal_feature_extract": _FEATURE_SQL,
    "multimodal_frame_sample": _FRAME_SAMPLE_SQL,
    "multimodal_gif_frames": _GIF_FRAMES_SQL,
    "multimodal_decode": _DECODE_SQL,
    "multimodal_decode_jpeg": _DECODE_JPEG_SQL,
    "multimodal_audio_decode": _AUDIO_DECODE_SQL,
}
