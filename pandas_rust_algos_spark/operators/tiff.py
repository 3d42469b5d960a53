"""Baseline TIFF 6.0 codec, from scratch (public spec: Adobe TIFF
Revision 6.0, 1992): uncompressed (Compression=1) 8-bit grayscale and
RGB, strip-organized, BOTH byte orders — little-endian ``II`` and
big-endian ``MM`` — decoded from the same code path (endianness is a
per-file header property, the one thing TIFF forces every reader to
get right).

Scope, stated honestly: this is the *baseline uncompressed* profile —
the archival/scientific-capture flavor a crawl actually encounters
for scanned documents and raw sensor dumps. LZW/JPEG-in-TIFF
compression and planar configuration 2 raise ``NotImplementedError``
loudly (the LZW entropy coder exists in ``multimodal``'s GIF codec
but TIFF-LZW differs in bit order and early-change; wiring that is a
separate, careful job — not silently decoded wrong).

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
_PLANAR = 284

_TYPE_SHORT, _TYPE_LONG = 3, 4
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def encode_tiff(arr: np.ndarray, *, rows_per_strip: int = 4,
                big_endian: bool = False) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 pixels as baseline
    uncompressed TIFF. ``rows_per_strip`` deliberately defaults small
    so even tiny gate images exercise multi-strip assembly;
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
    bo = ">" if big_endian else "<"
    flat = a.reshape(h, w * spp)
    strips = [
        flat[r:r + rows_per_strip].tobytes()
        for r in range(0, h, rows_per_strip)
    ]

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
        entry(_COMPRESSION, _TYPE_SHORT, 1, 1),
        entry(_PHOTOMETRIC, _TYPE_SHORT, 1, 1 if spp == 1 else 2),
        entry(_STRIP_OFFSETS, off_typ, n_strips,
              strip_offsets if n_strips == 1 else 0),
        entry(_SAMPLES, _TYPE_SHORT, 1, spp),
        entry(_ROWS_PER_STRIP, _TYPE_LONG, 1, rows_per_strip),
        entry(_STRIP_COUNTS, off_typ, n_strips,
              [len(s) for s in strips] if n_strips == 1 else 0),
        entry(_PLANAR, _TYPE_SHORT, 1, 1),
    ]
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
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (baseline "
            "uncompressed only; LZW/JPEG-in-TIFF need distinct entropy "
            "decoders)")
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
    data = b"".join(
        payload[o:o + c] for o, c in zip(offsets, counts))
    need = h * w * spp
    if len(data) < need:
        raise ValueError(
            f"truncated TIFF: {len(data)} strip bytes < {need}")
    a = np.frombuffer(data[:need], dtype=np.uint8)
    return a.reshape((h, w) if spp == 1 else (h, w, 3))
