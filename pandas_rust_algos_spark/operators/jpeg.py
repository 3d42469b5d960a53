"""From-scratch JPEG (ITU-T T.81) codecs — no decoder libraries.

Two public-spec JPEG processes, both implemented end-to-end in
numpy/stdlib (the container ships no image libraries; SURVEY §2.3
multimodal extension, same design as the PNG/GIF codecs in
``multimodal.py``):

- **Lossless JPEG** (T.81 Annex H, process 14, SOF3): predictive
  coding — per-sample predictor (7 selectable modes), difference
  categories entropy-coded with canonical Huffman tables, byte
  stuffing. EXACT round trip (it is the archival/DICOM flavor), which
  is what makes the ``jpeg_media_features`` gate fully oracle-able:
  the decoded pixels equal the encoder's input bit-for-bit.
- **Baseline sequential DCT** (T.81 Annex F, process 0, SOF0): the
  ubiquitous ``.jpg`` — level shift, 8×8 forward DCT, quality-scaled
  Annex K quantization, zigzag, DC-difference + AC run/size Huffman
  coding; decode reverses with Huffman → dequantize → IDCT → YCbCr →
  RGB, 4:4:4 / 4:2:0 / 4:2:2 sampling, restart markers. Lossy by
  nature, so it is conformance-tested (hand-assembled streams, an
  independent naive-IDCT cross-check, round-trip PSNR bounds) rather
  than hash-oracled.

Entropy coding is pure-Python bit loops over tiny payloads inside the
Arrow-batched UDF path — the same throughput posture as the GIF LZW
coder; the DCT/color math is vectorized numpy. Huffman tables are
carried in the stream (DHT), so the decoder never assumes the encoder's
choices.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg_lossless",
    "encode_jpeg_baseline",
    "decode_jpeg",
]

# --------------------------------------------------------------- tables

#: standard luminance/chrominance quantization tables (T.81 Annex K.1/K.2)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: standard Huffman specs (T.81 Annex K.3-K.6): (#codes of len 1..16, values)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)


def _zigzag() -> np.ndarray:
    """Zigzag scan order: position i holds the raster index of the i-th
    zigzag coefficient (generated, not transcribed)."""
    out = []
    for s in range(15):
        ys = range(max(0, s - 7), min(s, 7) + 1)
        for y in (ys if s % 2 else reversed(list(ys))):
            out.append(y * 8 + (s - y))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()

#: 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_DCT_M = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
     * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


# --------------------------------------------------------- bit plumbing


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        """Pad the tail with 1-bits to a byte boundary (T.81 F.1.2.3)."""
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)

    def restart(self, n: int) -> None:
        """Byte-align and emit the RSTn marker (T.81 F.1.2.3: restart
        markers stand between byte-aligned entropy segments)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    stops at markers, and can realign across RSTn."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 0x07)
            else:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if not self._nbits:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume the RSTn marker at the current
        position (called between restart intervals)."""
        self._acc = 0
        self._nbits = 0
        if not (self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n: int) -> None:
        self.n = n


def _build_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length) (T.81 C.2)."""
    code, k = 0, 0
    table: dict[int, tuple[int, int]] = {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(table) != len(vals):
        raise ValueError("inconsistent Huffman spec")
    return table


def _build_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> value."""
    enc = _build_encode_table(bits, vals)
    return {(ln, code): v for v, (code, ln) in enc.items()}


def _decode_huff(reader: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.read_bit()
        ln += 1
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in JPEG stream")


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extend(v: int, ssss: int) -> int:
    """T.81 F.12: recover a signed value from its SSSS magnitude bits."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _dht(tclass: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return _marker(0xC4, bytes([tclass << 4 | tid]) + bytes(bits)
                   + bytes(vals))


# ------------------------------------------------------ lossless (SOF3)


def encode_jpeg_lossless(arr: np.ndarray, *, predictor: int = 1) -> bytes:
    """8-bit grayscale (HxW) or color (HxWxC, C<=4) → lossless JPEG
    (T.81 process 14, SOF3). Bit-exact round trip with
    :func:`decode_jpeg`; components are stored interleaved (Hi=Vi=1 →
    one sample per component per MCU) without color transform."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or not 1 <= a.shape[2] <= 4:
        raise ValueError(f"expected HxW or HxWxC (C<=4), got {a.shape}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"predictor must be 1..7, got {predictor}")
    h, w, nc = a.shape
    planes = a.astype(np.int64)

    # per-plane predictions, vectorized (T.81 H.1.2.1): interior rows
    # use the selected predictor; row 0 predicts from the left, sample
    # (0,0) from 2^(P-1)=128; column 0 predicts from above.
    diffs = np.empty((h, w, nc), dtype=np.int64)
    for c in range(nc):
        p = planes[:, :, c]
        ra = np.zeros_like(p)  # left
        rb = np.zeros_like(p)  # above
        rc = np.zeros_like(p)  # above-left
        ra[:, 1:] = p[:, :-1]
        rb[1:, :] = p[:-1, :]
        rc[1:, 1:] = p[:-1, :-1]
        px = _predict(ra, rb, rc, predictor)
        px[0, 1:] = p[0, :-1]     # first line: always Ra
        px[1:, 0] = p[:-1, 0]     # first column: always Rb
        px[0, 0] = 128
        diffs[:, :, c] = p - px

    table = _build_encode_table(*HUFF_DC_LUM)
    wtr = _BitWriter()
    flat = diffs.reshape(-1, nc)  # raster MCU order, components interleaved
    for row in flat:
        for c in range(nc):
            d = int(row[c])
            # differences are mod 2^16; 8-bit inputs stay in ±255
            ssss = _category(d)
            code, ln = table[ssss]
            wtr.write(code, ln)
            if ssss:
                wtr.write(d if d >= 0 else d - 1, ssss)
    entropy = wtr.flush()

    comp_spec = b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(nc))
    sos_spec = b"".join(struct.pack(">BB", c + 1, 0) for c in range(nc))
    return (
        b"\xFF\xD8"                                        # SOI
        + _dht(0, 0, HUFF_DC_LUM)
        + _marker(0xC3, struct.pack(">BHHB", 8, h, w, nc) + comp_spec)
        + _marker(0xDA, bytes([nc]) + sos_spec
                  + struct.pack(">BBB", predictor, 0, 0))  # Ss=pred, Al=0
        + entropy
        + b"\xFF\xD9"                                      # EOI
    )


def _predict(ra, rb, rc, sel: int):
    """T.81 H.1.2.1 predictors 1-7 (vectorized over full planes)."""
    if sel == 1:
        return ra.copy()
    if sel == 2:
        return rb.copy()
    if sel == 3:
        return rc.copy()
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1


# ------------------------------------------------------- baseline (SOF0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality scaling of the Annex K base tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((QUANT_CHROM * scale + 50) // 100, 1, 255)
    return lum.astype(np.int32), chrom.astype(np.int32)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 8, 8) DCT coefficients."""
    return _DCT_M @ plane @ _DCT_M.T


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coefs @ _DCT_M


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """HxW (multiple of 8) → (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _pad_to8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_to_ycbcr(a: np.ndarray) -> np.ndarray:
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def encode_jpeg_baseline(arr: np.ndarray, *, quality: int = 90,
                         subsampling: str = "444",
                         restart_interval: int = 0) -> bytes:
    """8-bit grayscale (HxW) or RGB (HxWx3) → baseline sequential JPEG
    (T.81 process 0, SOF0): JFIF color transform, 4:4:4 or 4:2:0
    chroma sampling, quality-scaled Annex K quantization, standard
    Huffman tables. Lossy (quantized DCT) — pair with
    :func:`decode_jpeg` round-trip tolerance tests, not hash oracles."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected HxW or HxWx3 uint8, got {a.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    h, w = a.shape[:2]
    lum_q, chrom_q = _quality_tables(quality)
    sub = 2 if (subsampling == "420" and not gray) else 1

    if gray:
        planes = [a.astype(np.float64)]
        quants = [lum_q]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(a.astype(np.float64))
        planes = [ycc[:, :, i] for i in range(3)]
        quants = [lum_q, chrom_q, chrom_q]
        samp = [(sub, sub), (1, 1), (1, 1)]
        if sub == 2:
            # 2x2 box-average chroma downsample (pad odd dims first)
            for i in (1, 2):
                p = planes[i]
                p = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                planes[i] = (p[0::2, 0::2] + p[0::2, 1::2]
                             + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dc_tables = [_build_encode_table(*HUFF_DC_LUM),
                 _build_encode_table(*HUFF_DC_CHROM)]
    ac_tables = [_build_encode_table(*HUFF_AC_LUM),
                 _build_encode_table(*HUFF_AC_CHROM)]

    # per component: pad its plane to its MCU-aligned block grid, then
    # quantized zigzag coefficients in that component's block raster
    comp_zz, comp_bw = [], []
    for plane, q, (sh, sv) in zip(planes, quants, samp):
        bw, bh = mcux * sh, mcuy * sv
        ph, pw = plane.shape
        plane = np.pad(plane, ((0, bh * 8 - ph), (0, bw * 8 - pw)),
                       mode="edge")
        blocks = _to_blocks(plane - 128.0)
        coefs = np.rint(_fdct_blocks(blocks)
                        / q.reshape(8, 8)).astype(np.int64)
        comp_zz.append(coefs.reshape(-1, 64)[:, ZIGZAG])
        comp_bw.append(bw)

    wtr = _BitWriter()
    pred = [0] * len(planes)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.restart((m // restart_interval - 1) & 7)
            pred = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, zz in enumerate(comp_zz):
            sh, sv = samp[ci]
            tsel = 0 if ci == 0 else 1
            dct, act = dc_tables[tsel], ac_tables[tsel]
            for v in range(sv):
                for hh in range(sh):
                    bi = (my * sv + v) * comp_bw[ci] + mx * sh + hh
                    block = zz[bi]
                    diff = int(block[0]) - pred[ci]
                    pred[ci] = int(block[0])
                    ssss = _category(diff)
                    code, ln = dct[ssss]
                    wtr.write(code, ln)
                    if ssss:
                        wtr.write(diff if diff >= 0 else diff - 1, ssss)
                    run = 0
                    for k in range(1, 64):
                        val = int(block[k])
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            zcode, zln = act[0xF0]      # ZRL: 16 zeros
                            wtr.write(zcode, zln)
                            run -= 16
                        size = _category(val)
                        code, ln = act[run << 4 | size]
                        wtr.write(code, ln)
                        wtr.write(val if val >= 0 else val - 1, size)
                        run = 0
                    if run:
                        code, ln = act[0x00]            # EOB
                        wtr.write(code, ln)
    entropy = wtr.flush()

    nc = len(planes)
    dqt = _marker(0xDB, bytes([0]) + bytes(int(v) for v in lum_q[ZIGZAG]))
    if nc == 3:
        dqt += _marker(0xDB, bytes([1])
                       + bytes(int(v) for v in chrom_q[ZIGZAG]))
    comp_spec = b"".join(
        struct.pack(">BBB", c + 1, samp[c][0] << 4 | samp[c][1],
                    0 if c == 0 else 1)
        for c in range(nc))
    sos_spec = b"".join(
        struct.pack(">BB", c + 1, 0 if c == 0 else 0x11) for c in range(nc))
    huff = _dht(0, 0, HUFF_DC_LUM) + _dht(1, 0, HUFF_AC_LUM)
    if nc == 3:
        huff += _dht(0, 1, HUFF_DC_CHROM) + _dht(1, 1, HUFF_AC_CHROM)
    dri = (_marker(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (
        b"\xFF\xD8"
        + _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dri
        + dqt
        + _marker(0xC0, struct.pack(">BHHB", 8, h, w, nc) + comp_spec)
        + huff
        + _marker(0xDA, bytes([nc]) + sos_spec + b"\x00\x3F\x00")
        + entropy
        + b"\xFF\xD9"
    )


# ---------------------------------------------------------------- decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG → uint8 array (HxW for 1 component, HxWxC otherwise).

    Handles baseline sequential DCT (SOF0: DQT/DHT parse, MCU Huffman
    decode, dequantize, IDCT, 4:4:4 / 4:2:0 / 4:2:2 upsampling, JFIF
    YCbCr→RGB, DRI/RSTn) and lossless predictive (SOF3: predictors 1-7,
    point transform 0). Progressive (SOF2) and arithmetic-coded
    variants raise ``NotImplementedError``."""
    buf = bytes(payload)
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        tag = buf[pos + 1]
        if tag == 0xD9:  # EOI
            break
        if tag in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError("progressive JPEG not supported")
        if tag in (0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        ln = struct.unpack_from(">H", buf, pos + 2)[0]
        body = buf[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if tag == 0xDB:  # DQT: one or more tables
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                o += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", 64, o).astype(np.int32)
                    o += 128
                else:
                    vals = np.frombuffer(body, np.uint8, 64, o).astype(np.int32)
                    o += 64
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = vals
                quant[tq] = t.reshape(8, 8)
        elif tag == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1:o + 17])
                nv = sum(bits)
                vals = list(body[o + 17:o + 17 + nv])
                o += 17 + nv
                (huff_ac if tc else huff_dc)[th] = _build_decode_table(
                    bits, vals)
        elif tag in (0xC0, 0xC1, 0xC3):  # SOF0/1 (baseline/ext seq), SOF3
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"mode": "lossless" if tag == 0xC3 else "dct",
                     "h": fh, "w": fw, "comps": comps}
        elif tag == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif tag == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "multi-scan JPEG not supported (single interleaved "
                    "scan only)")
            sel = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0x0F)
            ss, se, ahl = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if frame["mode"] == "lossless":
                if ahl & 0x0F:
                    raise NotImplementedError(
                        "lossless point transform not supported")
                return _decode_lossless_scan(
                    buf, pos, frame, sel, huff_dc, ss, restart_interval)
            return _decode_dct_scan(
                buf, pos, frame, sel, huff_dc, huff_ac, quant,
                restart_interval)
        # other markers (APPn, COM) are skipped
    raise ValueError("JPEG has no scan data")


def _decode_lossless_scan(buf, pos, frame, sel, huff_dc, predictor,
                          restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    nc = len(comps)
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless JPEG with subsampling not supported")
    if restart_interval:
        # a restart resets the PREDICTION state as at start-of-scan
        # (T.81 H.2.3), not just the bit alignment; our encoder never
        # emits DRI for lossless, so refuse rather than mis-predict
        raise NotImplementedError(
            "lossless JPEG with restart intervals not supported")
    tables = [huff_dc[sel[c["id"]][0]] for c in comps]
    rdr = _BitReader(buf, pos)
    planes = np.zeros((h, w, nc), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                ssss = _decode_huff(rdr, tables[c])
                if ssss == 16:
                    d = 32768
                else:
                    d = _extend(rdr.receive(ssss), ssss) if ssss else 0
                if y == 0 and x == 0:
                    px = 128
                elif y == 0:
                    px = int(planes[0, x - 1, c])
                elif x == 0:
                    px = int(planes[y - 1, 0, c])
                else:
                    ra = int(planes[y, x - 1, c])
                    rb = int(planes[y - 1, x, c])
                    rc = int(planes[y - 1, x - 1, c])
                    px = int(_predict(np.array(ra), np.array(rb),
                                      np.array(rc), predictor))
                planes[y, x, c] = (px + d) & 0xFFFF
    out = planes.astype(np.uint8)
    return out[:, :, 0] if nc == 1 else out


def _decode_dct_scan(buf, pos, frame, sel, huff_dc, huff_ac, quant,
                     restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]        # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
        c["dct"], c["act"] = sel[c["id"]]
    rdr = _BitReader(buf, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            rdr.restart()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            dct = huff_dc[c["dct"]]
            act = huff_ac[c["act"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    ssss = _decode_huff(rdr, dct)
                    diff = _extend(rdr.receive(ssss), ssss) if ssss else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(rdr, act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16      # ZRL
                                continue
                            break            # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(rdr.receive(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = zz
                    bi = ((my * c["v"] + v) * c["bw"] + mx * c["h"] + hh)
                    c["coef"][bi] = block.reshape(8, 8)
    planes = []
    for c in comps:
        deq = c["coef"] * quant[c["tq"]].astype(np.float64)
        spatial = np.clip(np.rint(_idct_blocks(deq) + 128.0),
                          0, 255).astype(np.uint8)
        ph, pw = c["bh"] * 8, c["bw"] * 8
        plane = (spatial.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(ph, pw))
        # upsample to full-frame resolution, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:
        return _ycbcr_to_rgb(planes[0].astype(np.float64),
                             planes[1].astype(np.float64),
                             planes[2].astype(np.float64))
    return np.stack(planes, axis=2)
