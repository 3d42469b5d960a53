"""Baseline TIFF 6.0 codec, from scratch (public spec: Adobe TIFF
Revision 6.0, 1992): uncompressed (Compression=1) 8-bit grayscale and
RGB, strip-organized, BOTH byte orders — little-endian ``II`` and
big-endian ``MM`` — decoded from the same code path (endianness is a
per-file header property, the one thing TIFF forces every reader to
get right).

Scope: baseline uncompressed (Compression=1) AND TIFF-LZW
(Compression=5, spec §13) with the horizontal-differencing predictor
(tag 317, Predictor=2) — the archival/scanned-document flavors a
crawl actually encounters. TIFF-LZW is implemented from scratch here
(r9; previously a loud guard): unlike GIF's LZW it packs codes
MSB-first and uses the EARLY-CHANGE convention — the writer widens
the code size when the next code to assign reaches 2^n − 1 (one
earlier than GIF), and the decoder, whose table additions lag the
writer's by exactly one code, compensates by widening at 2^n − 2.
The 9-bit era is pinned against the spec's own <7 7 7 8 8 7 7 6 6>
example stream in tests; round trips cross every width boundary and
the 4094-entry table reset. JPEG-in-TIFF and planar configuration 2
still raise ``NotImplementedError`` loudly.

Like the other from-scratch codecs here (PNG/GIF/JPEG/μ-law), the
encoder⇄decoder round trip is bit-exact, so the media gate's
pixel-CSV md5 oracle proves the decode value-exactly. Executors run
this inside ``mapInPandas`` batches (numpy-only) — the Spark-side
plumbing is `operators/multimodal.py`'s.

Reference scope: no media surface exists in the reference
(SURVEY §2.3) — driver-brief multimodal extension.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_tiff", "decode_tiff"]

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SAMPLES, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _PREDICTOR = 284, 317

# TIFF-LZW (spec §13): 256 = ClearCode, 257 = EndOfInformation, first
# dictionary entry 258; 12-bit ceiling; table reset once the next
# assignable code reaches 4094 (libtiff's threshold).
_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258
_LZW_RESET_AT = 4094


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW compress one strip: MSB-first bit packing, early
    change (the writer switches to n+1-bit codes as soon as the next
    code to ASSIGN reaches 2^n − 1 — one code earlier than GIF)."""
    out = bytearray()
    acc = accbits = 0
    nbits = 9

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc = (acc << nbits) | code
        accbits += nbits
        while accbits >= 8:
            accbits -= 8
            out.append((acc >> accbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _LZW_FIRST
    emit(_LZW_CLEAR)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << nbits) - 1 and nbits < 12:
            nbits += 1
        w = bytes([b])
        if next_code >= _LZW_RESET_AT:
            emit(_LZW_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = _LZW_FIRST
            nbits = 9
    if w:
        emit(table[w])
    emit(_LZW_EOI)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-LZW decompress one strip. The decoder's table additions
    lag the writer's by one code (the entry for code m completes only
    when code m+1 arrives), so it widens at 2^n − 2 where the writer
    widened at 2^n − 1 — the early-change compensation every TIFF
    reader must get right."""
    out = bytearray()
    bitpos = 0
    total = len(data) * 8
    nbits = 9
    table: list[bytes] = []
    prev: bytes | None = None
    while bitpos + nbits <= total:
        byte = bitpos >> 3
        chunk = int.from_bytes(data[byte:byte + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if not table:
            raise ValueError("TIFF-LZW: data before first ClearCode")
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"TIFF-LZW: corrupt code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << nbits) - 2 and nbits < 12:
                nbits += 1
        prev = entry
    return bytes(out)


def _undiff_rows(a: np.ndarray, spp: int) -> np.ndarray:
    """Invert the horizontal-differencing predictor (tag 317 = 2):
    per-row, per-channel modulo-256 prefix sum along the width."""
    h = a.shape[0]
    v = a.reshape(h, -1, spp)
    return np.add.accumulate(v, axis=1, dtype=np.uint8).reshape(a.shape)


def _diff_rows(a: np.ndarray, spp: int) -> np.ndarray:
    """Apply the horizontal-differencing predictor: per-row,
    per-channel modulo-256 deltas along the width."""
    h = a.shape[0]
    v = a.reshape(h, -1, spp).copy()
    v[:, 1:, :] -= v[:, :-1, :]  # uint8 arithmetic wraps mod 256
    return v.reshape(a.shape)

_TYPE_SHORT, _TYPE_LONG = 3, 4
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def encode_tiff(arr: np.ndarray, *, rows_per_strip: int = 4,
                big_endian: bool = False, compression: str = "none",
                predictor: int = 1) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 pixels as baseline
    TIFF — uncompressed or TIFF-LZW (``compression="lzw"``), with the
    optional horizontal-differencing predictor (``predictor=2``,
    LZW-only per spec §14: deltas concentrate mass near zero so the
    dictionary coder bites). ``rows_per_strip`` deliberately defaults
    small so even tiny gate images exercise multi-strip assembly;
    ``big_endian=True`` writes an ``MM`` file (same pixels, every
    multi-byte field swapped) so the decoder's endianness handling is
    testable from the encoder alone."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        h, w, spp = a.shape[0], a.shape[1], 1
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w, spp = a.shape[0], a.shape[1], 3
    else:
        raise ValueError(f"expected HxW or HxWx3 uint8, got {a.shape}")
    if h < 1 or w < 1:
        raise ValueError("empty image")
    if rows_per_strip < 1:
        raise ValueError("rows_per_strip must be >= 1")
    if compression not in ("none", "lzw"):
        raise ValueError(f"compression must be none|lzw, got {compression!r}")
    if predictor not in (1, 2):
        raise ValueError(f"predictor must be 1|2, got {predictor}")
    if predictor == 2 and compression != "lzw":
        raise ValueError("predictor=2 is only defined for LZW (spec §14)")
    bo = ">" if big_endian else "<"
    if predictor == 2:
        a = _diff_rows(a.reshape(h, w * spp), spp).reshape(a.shape)
    flat = a.reshape(h, w * spp)
    strips = [
        flat[r:r + rows_per_strip].tobytes()
        for r in range(0, h, rows_per_strip)
    ]
    if compression == "lzw":
        strips = [_lzw_encode(s) for s in strips]

    out = bytearray()
    out += (b"MM" if big_endian else b"II")
    out += struct.pack(bo + "H", 42)
    ifd_offset_pos = len(out)
    out += b"\x00\x00\x00\x00"  # patched below

    def pad_even() -> None:
        # TIFF 6.0 requires all values (and the IFD) to begin on a
        # word boundary; odd-sized strips would otherwise leave the
        # following value areas at odd offsets. StripByteCounts never
        # includes pad bytes, so decoders are unaffected.
        if len(out) % 2:
            out.append(0)

    strip_offsets = []
    for s in strips:
        pad_even()
        strip_offsets.append(len(out))
        out += s

    # out-of-line value areas (entries whose payload exceeds 4 bytes)
    extra: dict[int, int] = {}
    if spp == 3:
        pad_even()
        extra[_BITS] = len(out)
        out += struct.pack(bo + "3H", 8, 8, 8)
    if len(strips) > 1:  # two LONGs already exceed the 4 inline bytes
        pad_even()
        extra[_STRIP_OFFSETS] = len(out)
        out += struct.pack(bo + f"{len(strips)}L", *strip_offsets)
        extra[_STRIP_COUNTS] = len(out)
        out += struct.pack(bo + f"{len(strips)}L",
                           *[len(s) for s in strips])

    def entry(tag: int, typ: int, count: int, values) -> bytes:
        e = struct.pack(bo + "HHL", tag, typ, count)
        if tag in extra:
            return e + struct.pack(bo + "L", extra[tag])
        fmt = "H" if typ == _TYPE_SHORT else "L"
        vals = values if isinstance(values, (list, tuple)) else [values]
        packed = struct.pack(bo + f"{len(vals)}{fmt}", *vals)
        if len(packed) > 4:
            raise AssertionError(
                f"tag {tag}: {len(packed)} inline bytes > 4 — must be "
                "out-of-line")
        return e + packed.ljust(4, b"\x00")

    n_strips = len(strips)
    off_typ = _TYPE_LONG
    entries = [
        entry(_WIDTH, _TYPE_LONG, 1, w),
        entry(_LENGTH, _TYPE_LONG, 1, h),
        entry(_BITS, _TYPE_SHORT, spp, [8] * spp),
        entry(_COMPRESSION, _TYPE_SHORT, 1,
              5 if compression == "lzw" else 1),
        entry(_PHOTOMETRIC, _TYPE_SHORT, 1, 1 if spp == 1 else 2),
        entry(_STRIP_OFFSETS, off_typ, n_strips,
              strip_offsets if n_strips == 1 else 0),
        entry(_SAMPLES, _TYPE_SHORT, 1, spp),
        entry(_ROWS_PER_STRIP, _TYPE_LONG, 1, rows_per_strip),
        entry(_STRIP_COUNTS, off_typ, n_strips,
              [len(s) for s in strips] if n_strips == 1 else 0),
        entry(_PLANAR, _TYPE_SHORT, 1, 1),
    ]
    if predictor == 2:
        entries.append(entry(_PREDICTOR, _TYPE_SHORT, 1, 2))
    entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])

    pad_even()
    ifd_offset = len(out)
    out += struct.pack(bo + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(bo + "L", 0)  # no next IFD
    out[ifd_offset_pos:ifd_offset_pos + 4] = struct.pack(
        bo + "L", ifd_offset)
    return bytes(out)


def _read_values(bo: str, typ: int, count: int, raw4: bytes,
                 payload: bytes) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise NotImplementedError(f"TIFF field type {typ} not supported")
    fmt = {1: "B", 2: "B", 3: "H", 4: "L", 5: "Q"}[typ]
    if typ == 5:  # RATIONAL: out of scope for the fields we read
        raise NotImplementedError("RATIONAL fields not supported")
    total = size * count
    if total <= 4:
        return list(struct.unpack(bo + f"{count}{fmt}", raw4[:total]))
    (offset,) = struct.unpack(bo + "L", raw4)
    return list(struct.unpack(
        bo + f"{count}{fmt}", payload[offset:offset + total]))


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode baseline uncompressed TIFF (either byte order) to HxW
    (grayscale) or HxWx3 (RGB) uint8. Multi-strip images reassemble in
    strip order; truncated strips, unsupported compression, and planar
    configuration 2 fail loudly."""
    payload = bytes(payload)
    if len(payload) < 8:
        raise ValueError("not a TIFF: short header")
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"not a TIFF: byte-order mark {payload[:2]!r}")
    (magic,) = struct.unpack(bo + "H", payload[2:4])
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic} != 42")
    (ifd,) = struct.unpack(bo + "L", payload[4:8])

    (n_entries,) = struct.unpack(bo + "H", payload[ifd:ifd + 2])
    fields: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack(
            bo + "HHL", payload[base:base + 8])
        fields[tag] = _read_values(
            bo, typ, count, payload[base + 8:base + 12], payload)

    def one(tag: int, default=None) -> int:
        if tag not in fields:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return fields[tag][0]

    comp = one(_COMPRESSION, 1)
    if comp not in (1, 5):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (baseline "
            "uncompressed + LZW; JPEG-in-TIFF needs a distinct entropy "
            "decoder)")
    pred = one(_PREDICTOR, 1)
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred} not supported")
    if one(_PLANAR, 1) != 1:
        raise NotImplementedError("planar configuration 2 not supported")
    w, h = one(_WIDTH), one(_LENGTH)
    spp = one(_SAMPLES, 1)
    bits = fields.get(_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"bits per sample {bits} != 8")
    if spp not in (1, 3):
        raise NotImplementedError(f"{spp} samples per pixel")

    offsets = fields[_STRIP_OFFSETS]
    counts = fields[_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("strip offsets/counts length mismatch")
    raw = (payload[o:o + c] for o, c in zip(offsets, counts))
    if comp == 5:
        data = b"".join(_lzw_decode(s) for s in raw)
    else:
        data = b"".join(raw)
    need = h * w * spp
    if len(data) < need:
        raise ValueError(
            f"truncated TIFF: {len(data)} strip bytes < {need}")
    a = np.frombuffer(data[:need], dtype=np.uint8)
    if pred == 2:
        # predictor deltas are row-local, so inverting on the fully
        # assembled rows is strip-boundary-safe
        a = _undiff_rows(a.reshape(h, w * spp), spp).reshape(-1)
    return a.reshape((h, w) if spp == 1 else (h, w, 3))
