"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with REAL decoders for the payload codecs this container can express.

Design: a media item is a row with an opaque ``binary`` column plus
typed metadata (modality, byte size, content hash). The modality string
names the payload codec, and decode is genuinely implemented for:

- ``text/utf-8``  — UTF-8 bytes → str (documents fixture);
- ``vec/f32le``   — packed little-endian float32 → ndarray (embeddings
  fixture);
- ``image/bmp``   — uncompressed 24-bit BI_RGB Windows bitmap → HxWx3
  uint8 array (header parse + strided raster read, numpy only);
- ``image/ppm``   — binary PPM (P6) → HxWx3 uint8 array;
- ``image/png``   — REAL compressed decode: stdlib ``zlib`` DEFLATE
  inflate + full scanline unfiltering (None/Sub/Up/Average/Paeth),
  8-bit gray/RGB/RGBA/palette (encoder too — any of the five filters);
- ``image/gif``   — REAL compressed decode #2: a from-scratch
  variable-width LZW entropy decoder (clear/end codes, KwKwK, 12-bit
  cap) + palette expansion; encoder included (palette build + LZW);
- ``image/jpeg``  — REAL compressed decode #3: a from-scratch ITU-T
  T.81 implementation (``operators/jpeg.py``) — baseline sequential
  DCT (SOF0: Huffman MCU decode, dequantize, IDCT, 4:4:4/4:2:0/4:2:2
  upsampling, YCbCr→RGB, restart markers) AND lossless predictive
  (SOF3, bit-exact round trip); encoders for both flavors included;
- ``audio/pcm_s16le`` — raw 16-bit little-endian PCM → int16 samples;
- ``audio/mulaw``  — G.711 μ-law companding codec (telephony): 8-bit
  codes expanded by the standard's closed-form segment/mantissa
  integer formula → int16 samples; encoder included;
- ``audio/wav``   — RIFF/WAVE container walk (chunk list, padding) →
  the PCM-16 samples inside; compressed WAV variants raise;
- ``video/ppm-seq``   — concatenated P6 frames → list of frames, with
  :func:`sample_frames` exploding every k-th frame to its own
  ``image/ppm`` media row (the frame-sampling step of a video
  pipeline).

Codecs whose entropy coders genuinely need decoder libraries this
container does not ship (MP3/H.264…) raise ``NotImplementedError``;
everything above — including the DEFLATE-compressed PNG path and both
JPEG flavors — is decoded for real, so the dispatch, batch transport,
feature, and transform plumbing is exercised end-to-end by true
byte-level decodes.
:func:`resize_media` (nearest-neighbor, pure index arithmetic)
re-encodes decoded images back to media rows — the
decode→transform→re-encode loop a training-data image pipeline runs.

Features are chosen to be deterministic AND oracle-expressible (DuckDB
computes the same values straight from the source tables), so the
decode→featurize path is hash-checked end-to-end by the driver gate,
not just rows-counted. The vec sum uses fixed-point micro-units
(floor(x·1e6) summed as int) — exact and associative, so the result is
independent of batch/partition boundaries and engine.

Scale notes: binary payloads dominate partition size, so the batch
iterator in :func:`extract_features` controls memory as
(maxRecordsPerBatch × payload) — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for large media, and
never groupBy the payload itself (metadata carries the join keys).
Only (id, metadata, features) leave the Python worker; payloads are
dropped before any exchange.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "as_media",
    "vec_media",
    "decode_payload",
    "decode_strict",
    "encode_bmp",
    "encode_gif",
    "encode_png",
    "encode_ppm",
    "encode_mulaw",
    "encode_pcm_s16le",
    "encode_ppm_seq",
    "encode_wav",
    "audio_media_from_vecs",
    "image_media_from_vecs",
    "extract_features",
    "extract_features_arrow",
    "resize_media",
    "sample_frames",
]

#: canonical multimodal row: payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # payload codec name
    StructField("payload", BinaryType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("content_md5", StringType(), False),
])

#: decode→featurize output: fixed-width doubles + a text checksum that
#: proves the decode round-trip byte-exactly (NULL for non-text)
FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("f0", DoubleType(), True),
    StructField("f1", DoubleType(), True),
    StructField("f2", DoubleType(), True),
    StructField("f3", DoubleType(), True),
    StructField("check_md5", StringType(), True),
])


# ------------------------------------------------------ codecs (encode)


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit BI_RGB Windows bitmap
    (bottom-up raster, BGR byte order, rows padded to 4 bytes)."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data = raster.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def _decode_bmp(payload: bytes) -> np.ndarray:
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP variant bpp={bpp} compression={comp} not supported "
            "(24-bit BI_RGB only)")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                           offset=offset).reshape(h, stride)
    img = raster[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def _ppm_read_frame(payload: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one P6 frame starting at ``pos``; returns (HxWx3, next pos).
    Handles arbitrary whitespace and ``#`` comments in the header."""
    if payload[pos:pos + 2] != b"P6":
        raise ValueError(f"not a P6 frame at offset {pos}")
    pos += 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = vals
    if maxval != 255:
        raise NotImplementedError("P6 maxval != 255 not supported")
    n = w * h * 3
    img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return img.reshape(h, w, 3).copy(), pos + n


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel for the supported color types
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, *, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """8-bit image → PNG (a REAL compressed codec, stdlib ``zlib``
    DEFLATE — no external decoder libraries needed). Accepts ``(H, W)``
    grayscale, ``(H, W, 3)`` RGB, or ``(H, W, 4)`` RGBA uint8 arrays.

    ``filter_type`` applies one PNG scanline filter (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) to every row — spec-conformant output for
    any of the five, which lets tests drive the decoder's unfiltering
    paths individually. Adaptive per-row selection is an encoder-size
    optimization, deliberately out of scope."""
    import struct
    import zlib

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected HxW[x{{1,3,4}}] uint8, got {arr.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    raw = a.reshape(h, w * c).astype(np.int64)
    prev = np.zeros(w * c, dtype=np.int64)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.zeros(w * c, dtype=np.int64)
        left[c:] = cur[:-c]
        ul = np.zeros(w * c, dtype=np.int64)
        ul[c:] = prev[:-c]
        if filter_type == 0:
            flt = cur
        elif filter_type == 1:
            flt = cur - left
        elif filter_type == 2:
            flt = cur - prev
        elif filter_type == 3:
            flt = cur - (left + prev) // 2
        else:
            flt = cur - _paeth(left, prev, ul)
        lines.append(bytes([filter_type]) + (flt % 256).astype(np.uint8)
                     .tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), compress_level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4)."""
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    return np.where((pa <= pb) & (pa <= pc), left,
                    np.where(pb <= pc, up, ul))


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array: ``(H, W)`` for grayscale, ``(H, W, C)``
    otherwise (palette expands via PLTE to RGB). Full scanline
    unfiltering (None/Sub/Up/Average/Paeth); 8-bit depth,
    non-interlaced. The sequential filters (Sub/Average/Paeth) carry a
    true along-row data dependency, so they unfilter pixel-stepwise on
    ``C``-wide lanes — O(W) python steps per row on vector operands,
    which is the honest cost of DEFLATE-era formats without a native
    codec; production hot paths would swap in one via the same
    modality dispatch."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, comp, flt_method, interlace = ihdr
    if depth != 8 or comp != 0 or flt_method != 0:
        raise NotImplementedError(
            f"PNG depth={depth}/compression={comp} unsupported "
            "(8-bit, method-0 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color_type}")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size {len(raw)} != expected {h * (stride + 1)}")
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=y * (stride + 1) + 1).astype(np.int64)
        if ft == 0:
            rec = cur
        elif ft == 2:
            rec = (cur + prev) % 256
        elif ft in (1, 3, 4):
            rec = cur.copy()
            for x in range(0, stride, c):
                left = rec[x - c:x] if x else np.zeros(c, dtype=np.int64)
                up = prev[x:x + c]
                ul = prev[x - c:x] if x else np.zeros(c, dtype=np.int64)
                if ft == 1:
                    rec[x:x + c] = (rec[x:x + c] + left) % 256
                elif ft == 3:
                    rec[x:x + c] = (rec[x:x + c] + (left + up) // 2) % 256
                else:
                    rec[x:x + c] = (rec[x:x + c]
                                    + _paeth(left, up, ul)) % 256
        else:
            raise ValueError(f"bad PNG filter byte {ft} on row {y}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, c)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        return plte[img[:, :, 0]]
    return img[:, :, 0] if c == 1 else img


# --------------------------------------------------------- GIF (LZW)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor variable-width LZW (LSB-first bit packing). The
    width-bump rule mirrors the decoder's exactly: the decoder's
    dictionary lags the encoder's by ONE entry, so the encoder widens
    at ``next_code == (1 << code_size) + 1`` where the decoder widens
    at ``next_code == 1 << code_size`` — the classic off-by-one that
    the round-trip property tests pin."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset() -> tuple[dict, int]:
        return {bytes([i]): i for i in range(clear)}, end + 1

    table, next_code = reset()
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            # table full (max index 4095, matching the decoder's add
            # guard): clear and restart rather than emit a 13-bit code
            emit(clear)
            code_size = min_code_size + 1
            table, next_code = reset()
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_encode` (the GIF spec decoder: clear /
    end codes, KwKwK case, 12-bit cap with deferred adds)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                code_size = min_code_size + 1
                table = {i: bytes([i]) for i in range(clear)}
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            else:  # KwKwK: the code being defined by this very step
                entry = prev + prev[:1]
                if next_code < 4096:
                    table[next_code] = entry
                    next_code += 1
            out += entry
            prev = entry
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def encode_gif(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → single-frame GIF87a (a REAL compressed codec:
    palette + variable-width LZW over the index stream). The image may
    use at most 256 distinct colors (GIF's model); raises otherwise."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    colors, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF allows at most 256 colors, image has {len(colors)}")
    # palette size must be a power of two in [2, 256]
    depth = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << depth, 3), dtype=np.uint8)
    table[:len(colors)] = colors
    min_code_size = max(2, depth)
    lzw = _lzw_encode(indices.astype(np.uint8).tobytes(), min_code_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (b"GIF87a"
            + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
            + table.tobytes()
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([min_code_size]) + bytes(blocks) + b"\x00\x3B")


def _decode_gif(payload: bytes) -> np.ndarray:
    """Single-frame GIF → HxWx3 uint8 RGB: palette load, extension
    skip, sub-block reassembly, LZW decode. Non-interlaced only."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if palette is None:
            raise ValueError("GIF image without a color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(data), min_code_size), np.uint8)
        if len(idx) < w * h:
            raise ValueError(
                f"GIF index stream has {len(idx)} pixels, need {w * h}")
        return palette[idx[:w * h]].reshape(h, w, 3).copy()
    raise ValueError("GIF missing image descriptor")


def encode_pcm_s16le(samples: np.ndarray) -> bytes:
    """int16 samples → raw little-endian PCM bytes."""
    return np.asarray(samples, dtype="<i2").tobytes()


def encode_mulaw(samples: np.ndarray) -> bytes:
    """int16 PCM → G.711 μ-law codes (ITU-T G.711, the telephony
    companding codec): clip to ±32635, bias by 132, segment exponent =
    position of the leading bit, 4-bit mantissa, one's-complemented on
    the wire. 2:1 compression with ~SNR-flat quantization. Carries the
    standard's two-zeros quirk: −0 (code 0x7F) and +0 (0xFF) decode
    identically; every other code round-trips encode(decode(c)) == c."""
    x = np.clip(np.asarray(samples, dtype=np.int64), -32635, 32635)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.abs(x) + 132
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int64)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()


def _decode_mulaw(payload: bytes) -> np.ndarray:
    """G.711 μ-law codes → int16 PCM: complement, split segment
    exponent / mantissa, expand ``((mant·8+132) << exp) − 132``, apply
    sign. Pure integer arithmetic — the same closed form a SQL oracle
    can evaluate per element (which is what makes the gate
    hash-checkable)."""
    u = (~np.frombuffer(payload, dtype=np.uint8).astype(np.int64)) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 132) << exp) - 132
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def encode_wav(samples: np.ndarray, *, sample_rate: int = 16_000,
               channels: int = 1) -> bytes:
    """int16 samples → RIFF/WAVE container (PCM format 1, 16-bit LE) —
    the standard on-disk framing around the raw PCM codec."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE → int16 samples. Walks the chunk list (tolerating
    extra chunks like LIST/fact with proper even-byte padding), takes
    the ``fmt `` and ``data`` chunks; PCM (format 1) 16-bit only —
    compressed WAV variants (ADPCM/MP3-in-WAV) raise like any other
    entropy-coded codec."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are 2-byte aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt or data chunk")
    audio_format, _channels, _rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits} unsupported "
            "(PCM-16 only; compressed WAV needs codec libraries)")
    if len(data) % 2:
        data = data[:-1]
    return np.frombuffer(data, dtype="<i2")


def encode_ppm_seq(frames: list[np.ndarray]) -> bytes:
    """Frame list → concatenated P6 stream (the ``video/ppm-seq``
    codec: video-as-frames with zero temporal compression)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_payload(payload: bytes, modality: str):
    """Decode a payload per its modality codec.

    Returns ``str`` (text/utf-8), float32 ndarray (vec/f32le), HxWx3
    uint8 ndarray (image/bmp, image/ppm), int16 ndarray
    (audio/pcm_s16le), or list of HxWx3 frames (video/ppm-seq).
    Compressed codecs raise ``NotImplementedError`` — their entropy
    coders need decoder libraries absent from this container.
    """
    payload = bytes(payload)
    if modality == "text/utf-8":
        return payload.decode("utf-8")
    if modality == "vec/f32le":
        if len(payload) % 4:
            raise ValueError(
                f"vec/f32le payload length {len(payload)} not a multiple of 4"
            )
        return np.frombuffer(payload, dtype="<f4")
    if modality == "image/bmp":
        return _decode_bmp(payload)
    if modality == "image/png":
        return _decode_png(payload)
    if modality == "image/gif":
        return _decode_gif(payload)
    if modality == "image/jpeg":
        from pandas_rust_algos_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if modality == "image/tiff":
        from pandas_rust_algos_spark.operators.tiff import decode_tiff

        return decode_tiff(payload)
    if modality == "image/ppm":
        img, _end = _ppm_read_frame(payload, 0)
        return img
    if modality == "audio/pcm_s16le":
        if len(payload) % 2:
            raise ValueError(
                f"pcm_s16le payload length {len(payload)} not a multiple of 2")
        return np.frombuffer(payload, dtype="<i2")
    if modality == "audio/wav":
        return _decode_wav(payload)
    if modality == "audio/mulaw":
        return _decode_mulaw(payload)
    if modality == "video/ppm-seq":
        frames, pos = [], 0
        while pos < len(payload):
            frame, pos = _ppm_read_frame(payload, pos)
            frames.append(frame)
        return frames
    raise NotImplementedError(
        f"media decode for modality={modality!r} requires decoder libraries "
        "not present in this environment (bmp/ppm/png/gif/jpeg/pcm_s16le/"
        "wav/ppm-seq are decoded natively)"
    )


#: kept as the explicit "real media" entry point name
decode_strict = decode_payload


def _featurize(payload: bytes, modality: str):
    """Decode, then derive the fixed feature tuple (f0..f3, check_md5).

    text/utf-8: (n_chars, n_tokens, n_spaces, n_distinct_tokens,
    md5-of-bytes) — the md5 doubles as a byte-exact round-trip proof.
    vec/f32le: (dim, fixed-point micro sum, min, max, NULL) — all exact
    in float64, so no rounding is needed anywhere.
    """
    content = decode_payload(payload, modality)
    if modality == "text/utf-8":
        toks = content.split()
        return (
            float(len(content)),
            float(len(toks)),
            float(content.count(" ")),
            float(len(set(toks))),
            hashlib.md5(bytes(payload)).hexdigest(),
        )
    if modality in ("image/bmp", "image/ppm", "image/png", "image/gif",
                    "image/jpeg", "image/tiff"):
        h, w = content.shape[:2]
        c = content.shape[2] if content.ndim == 3 else 1
        # exact: integer pixel sum / count (both exact in float64); the
        # md5 over the canonical pixel CSV proves the decode (incl. the
        # PNG inflate + unfilter) value-exactly, oracle-recomputable
        digest = hashlib.md5(
            ",".join(str(int(v)) for v in content.reshape(-1)).encode()
        ).hexdigest()
        return (float(h), float(w),
                float(int(content.sum(dtype=np.int64)) / (h * w * c)),
                float(c), digest)
    if modality in ("audio/pcm_s16le", "audio/wav", "audio/mulaw"):
        n = len(content)
        if n == 0:
            return (0.0, None, None, None, None)
        mean_abs = int(np.abs(content.astype(np.int64)).sum()) / n
        return (float(n), float(mean_abs),
                float(content.min()), float(content.max()), None)
    if modality == "video/ppm-seq":
        if not content:
            return (0.0, None, None, None, None)
        h, w, c = content[0].shape
        total = sum(int(f.sum(dtype=np.int64)) for f in content)
        npx = sum(f.size for f in content)
        return (float(len(content)), float(h), float(w),
                float(total / npx), None)
    dim = len(content)
    if dim == 0:
        return (0.0, 0.0, None, None, None)
    micro = sum(int(math.floor(float(x) * 1e6)) for x in content)
    return (
        float(dim),
        micro / 1e6,
        float(content.min()),
        float(content.max()),
        None,
    )


def as_media(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Wrap an arbitrary binary-castable column into the canonical media
    schema (metadata computed JVM-side; a string column casts to its
    UTF-8 bytes, i.e. the ``text/utf-8`` codec)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def vec_media(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Pack a float-array column into ``vec/f32le`` media rows.

    The pack runs as an Arrow-batched pandas UDF — this is the ingestion
    boundary where raw media enters the engine, the one place bytes are
    *produced* rather than decoded. float32 → bytes is exact, so
    decode_payload inverts it losslessly.
    """
    @F.pandas_udf("binary")
    def _pack(vs: pd.Series) -> pd.Series:
        return vs.map(lambda v: np.asarray(v, dtype="<f4").tobytes())

    packed = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _pack(F.col(vec_col)).alias("payload"),
    )
    return packed.select(
        "media_id",
        F.lit("vec/f32le").alias("modality"),
        "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def image_media_from_vecs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    height: int,
    width: int,
    channels: int = 3,
    codec: str = "png",
) -> DataFrame:
    """Deterministically quantize a float-vector column into an
    ``height×width×channels`` uint8 image and encode it as a REAL
    compressed payload (``codec`` = ``png`` or ``gif``) — the
    synthetic ingestion path that lets fixtures without raw image
    bytes exercise the compressed-codec decodes end-to-end.

    Quantization is ``floor(clip(x, -1, 1) * 127) + 128`` per element
    (pure double arithmetic — bit-reproducible in any engine, which is
    what makes the downstream decode oracle-checkable). ``jpeg`` means
    LOSSLESS JPEG (T.81 SOF3) — exact round trip, so it stays
    oracle-checkable like png/gif. ``tiff`` payloads vary BY ID so a
    single decode gate covers the whole profile matrix from one
    column: little-endian ``II`` for even ids, BIG-endian ``MM`` for
    odd; ids ≡ 2 (mod 4) compress with TIFF-LZW and ids ≡ 3 (mod 4)
    add the horizontal-differencing predictor (`operators/tiff.py`,
    both from scratch — r9)."""
    if codec not in ("png", "gif", "jpeg", "tiff"):
        raise ValueError(f"codec must be png|gif|jpeg|tiff, got {codec!r}")
    if codec == "gif" and channels != 3:
        raise ValueError("gif codec requires channels=3")
    n = height * width * channels

    def _quantize(v) -> np.ndarray:
        a = np.asarray(v[:n], dtype=np.float64)
        if len(a) < n:
            raise ValueError(
                f"vector has {len(a)} dims, need {n} for "
                f"{height}x{width}x{channels}")
        px = (np.floor(np.clip(a, -1.0, 1.0) * 127.0)
              .astype(np.int64) + 128).astype(np.uint8)
        return px.reshape(height, width, channels)

    @F.pandas_udf("binary")
    def _enc(vs: pd.Series) -> pd.Series:
        def one(v):
            img = _quantize(v)
            if codec == "gif":
                return encode_gif(img)
            if codec == "jpeg":
                from pandas_rust_algos_spark.operators.jpeg import (
                    encode_jpeg_lossless,
                )

                return encode_jpeg_lossless(
                    img if channels != 1 else img[:, :, 0])
            return encode_png(img if channels != 1 else img[:, :, 0])
        return vs.map(one)

    @F.pandas_udf("binary")
    def _enc_tiff(ids: pd.Series, vs: pd.Series) -> pd.Series:
        from pandas_rust_algos_spark.operators.tiff import encode_tiff

        return pd.Series([
            encode_tiff(
                (_quantize(v) if channels != 1
                 else _quantize(v)[:, :, 0]),
                rows_per_strip=2,  # small: tiny images still multi-strip
                big_endian=bool(int(i) % 2),
                compression="lzw" if int(i) % 4 >= 2 else "none",
                predictor=2 if int(i) % 4 == 3 else 1,
            )
            for i, v in zip(ids, vs)
        ])

    packed = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        (_enc_tiff(F.col(id_col).cast("long"), F.col(vec_col))
         if codec == "tiff" else _enc(F.col(vec_col))).alias("payload"),
    )
    return packed.select(
        "media_id",
        F.lit(f"image/{codec}").alias("modality"),
        "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def audio_media_from_vecs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    n_samples: int = 48,
    codec: str = "mulaw",
) -> DataFrame:
    """Deterministically quantize a float-vector column into audio
    payloads — the synthetic ingestion path that lets the embeddings
    fixture exercise the audio decoders end-to-end:

    - ``mulaw``: G.711 μ-law CODE bytes
      (``floor(clip(x,-1,1)*127)+128`` per element — the companding
      decode expansion is a pure integer closed form);
    - ``wav``: int16 samples ``floor(clip(x,-1,1)*32767)`` framed in a
      RIFF/WAVE container (:func:`encode_wav`) — PCM is lossless, so
      the decoded samples ARE the quantization.

    Either way the downstream features are exactly recomputable by a
    SQL oracle straight from the source vectors."""
    n = n_samples
    if codec not in ("mulaw", "wav"):
        raise ValueError(f"codec must be mulaw|wav, got {codec!r}")

    @F.pandas_udf("binary")
    def _enc(vs: pd.Series) -> pd.Series:
        def one(v):
            a = np.asarray(v[:n], dtype=np.float64)
            if len(a) < n:
                raise ValueError(
                    f"vector has {len(a)} dims, need {n}")
            if codec == "wav":
                s = np.floor(np.clip(a, -1.0, 1.0) * 32767.0) \
                    .astype(np.int64)
                return encode_wav(s.astype(np.int16))
            return (np.floor(np.clip(a, -1.0, 1.0) * 127.0)
                    .astype(np.int64) + 128).astype(np.uint8).tobytes()
        return vs.map(one)

    packed = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _enc(F.col(vec_col)).alias("payload"),
    )
    return packed.select(
        "media_id",
        F.lit("audio/wav" if codec == "wav" else "audio/mulaw")
        .alias("modality"),
        "payload",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    The UDF boundary is per-batch (not per-row): each pandas DataFrame
    chunk arrives as one Arrow batch; only (id, metadata, features)
    leave the worker — payloads are dropped before the exchange.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _featurize(payload, modality)
                for payload, modality in zip(pdf["payload"], pdf["modality"])
            ]
            cols = list(zip(*feats)) if feats else [[], [], [], [], []]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["n_bytes"],
                "f0": pd.Series(cols[0], dtype="float64"),
                "f1": pd.Series(cols[1], dtype="float64"),
                "f2": pd.Series(cols[2], dtype="float64"),
                "f3": pd.Series(cols[3], dtype="float64"),
                "check_md5": pd.Series(cols[4], dtype="object"),
            })

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: the batch
    arrives as a pyarrow RecordBatch and never round-trips through
    pandas. For binary-heavy media rows that conversion is the dominant
    UDF cost (pandas boxes each payload into a Python bytes object even
    when untouched), so this is the preferred path once payloads exceed
    a few KB; the pandas variant stays for ergonomics."""
    import pyarrow as pa

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            payloads = batch.column("payload")
            modalities = batch.column("modality")
            feats = [
                _featurize(payloads[i].as_py(), modalities[i].as_py())
                for i in range(batch.num_rows)
            ]
            cols = list(zip(*feats)) if feats else [[], [], [], [], []]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("media_id"),
                    batch.column("modality"),
                    batch.column("n_bytes"),
                    pa.array(cols[0], type=pa.float64()),
                    pa.array(cols[1], type=pa.float64()),
                    pa.array(cols[2], type=pa.float64()),
                    pa.array(cols[3], type=pa.float64()),
                    pa.array(cols[4], type=pa.string()),
                ],
                names=["media_id", "modality", "n_bytes",
                       "f0", "f1", "f2", "f3", "check_md5"],
            )

    return media.mapInArrow(fn, schema=FEATURE_SCHEMA)


# ------------------------------------------------- media transforms


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize as pure index arithmetic (the standard
    pixel-center mapping: src = floor((dst + 0.5) · scale))."""
    sh, sw = img.shape[:2]
    rows = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64),
                      sh - 1)
    cols = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64),
                      sw - 1)
    return img[rows[:, None], cols[None, :]]


def _media_row(media_id, modality: str, payload: bytes) -> dict:
    return {
        "media_id": media_id,
        "modality": modality,
        "payload": payload,
        "n_bytes": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def _media_frame(rows: list[dict]) -> pd.DataFrame:
    cols = ["media_id", "modality", "payload", "n_bytes", "content_md5"]
    return pd.DataFrame(
        {c: [r[c] for r in rows] for c in cols}
        if rows else {c: [] for c in cols}
    )


def resize_media(media: DataFrame, height: int, width: int) -> DataFrame:
    """Decode image media rows, nearest-neighbor resize to
    ``height × width``, re-encode as ``image/ppm`` media rows — the
    decode → transform → re-encode loop of an image preprocessing
    pipeline, Arrow-batched end-to-end. Non-image modalities pass
    through untouched (a mixed-modality table needs no pre-split)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, modality, payload in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"]):
                if modality in ("image/bmp", "image/ppm", "image/png",
                                "image/gif"):
                    img = decode_payload(payload, modality)
                    if img.ndim == 2:           # grayscale → RGB
                        img = np.stack([img] * 3, axis=-1)
                    elif img.shape[2] == 4:     # drop alpha
                        img = img[:, :, :3]
                    elif img.shape[2] == 2:     # gray+alpha → RGB
                        img = np.stack([img[:, :, 0]] * 3, axis=-1)
                    out = encode_ppm(_resize_nearest(img, height, width))
                    rows.append(_media_row(mid, "image/ppm", out))
                else:
                    rows.append(_media_row(mid, modality, bytes(payload)))
            yield _media_frame(rows)

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every: int = 1) -> DataFrame:
    """Explode ``video/ppm-seq`` rows into one ``image/ppm`` media row
    per ``every``-th frame (media_id becomes ``video_id * 10^6 +
    frame_idx`` so frames stay traceable and unique). Frame sampling is
    the standard first step of a video training pipeline; payload rows
    only ever *grow* partition-locally — no shuffle, no driver data."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, modality, payload in zip(
                    pdf["media_id"], pdf["modality"], pdf["payload"]):
                if modality != "video/ppm-seq":
                    continue
                for idx, frame in enumerate(decode_payload(payload, modality)):
                    if idx % every == 0:
                        rows.append(_media_row(
                            mid * 1_000_000 + idx, "image/ppm",
                            encode_ppm(frame)))
            yield _media_frame(rows)

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)
