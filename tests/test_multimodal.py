"""Multimodal plumbing: media wrapping, REAL payload decode (utf-8 text
and packed-f32le vectors), and both feature-extraction transports."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from pandas_rust_algos_spark.operators import multimodal as mm
from pandas_rust_algos_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    return mm.as_media(d, "doc_id", "text", "text/utf-8")


@pytest.fixture(scope="module")
def vmedia(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(50)
    return mm.vec_media(e, "vec_id", "embedding")


def test_media_schema_and_metadata(media):
    rows = media.collect()
    assert media.columns == ["media_id", "modality", "payload",
                             "n_bytes", "content_md5"]
    for r in rows:
        assert r["n_bytes"] == len(r["payload"])
        assert len(r["content_md5"]) == 32


def test_text_decode_roundtrip(spark, sf_dir, media):
    """decode_payload inverts the string→binary cast byte-exactly: the
    feature check_md5 (computed from the decoded payload in Python)
    equals the JVM-side md5 of the original payload."""
    jvm = {r["media_id"]: r["content_md5"] for r in media.collect()}
    feats = mm.extract_features(media).collect()
    assert len(feats) == 50
    for r in feats:
        assert r["check_md5"] == jvm[r["media_id"]]
        assert r["f1"] <= r["f0"]        # tokens ≤ chars
        assert r["f3"] <= r["f1"]        # distinct tokens ≤ tokens


def test_vec_decode_roundtrip(spark, sf_dir, vmedia):
    """vec/f32le pack → decode is lossless: features computed from the
    decoded bytes equal features computed from the source arrays."""
    src = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="<f4")
        for r in load_table(spark, sf_dir, "embeddings").limit(50).collect()
    }
    feats = {r["media_id"]: r for r in mm.extract_features(vmedia).collect()}
    assert len(feats) == 50
    for vid, v in src.items():
        r = feats[vid]
        assert r["n_bytes"] == 4 * len(v)
        assert r["f0"] == float(len(v))
        assert r["f2"] == float(v.min())
        assert r["f3"] == float(v.max())
        assert r["check_md5"] is None


def test_arrow_and_pandas_paths_agree(media, vmedia):
    """mapInArrow and mapInPandas must produce identical features —
    same decoder, different batch transport — on BOTH codecs."""
    both = media.unionByName(vmedia)
    key = lambda r: (r["media_id"], r["modality"])  # noqa: E731
    a = {key(r): (r["f0"], r["f1"], r["f2"], r["f3"], r["check_md5"])
         for r in mm.extract_features(both).collect()}
    b = {key(r): (r["f0"], r["f1"], r["f2"], r["f3"], r["check_md5"])
         for r in mm.extract_features_arrow(both).collect()}
    assert a == b
    assert len(a) == 100


def test_decode_payload_local():
    """Unit: the codec functions themselves, no Spark involved."""
    assert mm.decode_payload("héllo".encode(), "text/utf-8") == "héllo"
    v = np.array([1.5, -2.25, 3.0], dtype="<f4")
    out = mm.decode_payload(v.tobytes(), "vec/f32le")
    assert out.dtype == np.float32 and list(out) == [1.5, -2.25, 3.0]
    with pytest.raises(ValueError, match="multiple of 4"):
        mm.decode_payload(b"\x00\x01\x02", "vec/f32le")
    assert hashlib.md5(b"x").hexdigest() == mm._featurize(b"x", "text/utf-8")[4]


def test_strict_decoder_raises(spark, sf_dir):
    """Compressed media codecs raise until decoder libs exist — the
    failure travels through the executor path."""
    d = load_table(spark, sf_dir, "documents").limit(5)
    media = mm.as_media(d, "doc_id", "text", "audio/mp3")
    with pytest.raises(Exception, match="NotImplementedError|decoder libraries"):
        mm.extract_features(media).collect()
    # image/jpeg is now REALLY decoded — garbage bytes must fail the
    # parse loudly, not fall through to the not-implemented branch
    jm = mm.as_media(d, "doc_id", "text", "image/jpeg")
    with pytest.raises(Exception, match="not a JPEG payload"):
        mm.extract_features(jm).collect()


# --------------------------------------- uncompressed codecs (round 3)


def _rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (7, 2), (16, 16)]:  # odd widths hit padding
        img = _rand_img(rng, h, w)
        out = mm.decode_payload(mm.encode_bmp(img), "image/bmp")
        assert out.shape == (h, w, 3)
        np.testing.assert_array_equal(out, img)


def test_ppm_roundtrip_exact_and_comments():
    rng = np.random.default_rng(8)
    img = _rand_img(rng, 4, 6)
    np.testing.assert_array_equal(
        mm.decode_payload(mm.encode_ppm(img), "image/ppm"), img)
    # header with comments and extra whitespace still parses
    hdr = b"P6\n# a comment\n 6   4 \n# another\n255\n"
    np.testing.assert_array_equal(
        mm.decode_payload(hdr + img.tobytes(), "image/ppm"), img)


def test_pcm_and_video_roundtrip():
    samples = np.array([0, -32768, 32767, 12345], dtype="<i2")
    out = mm.decode_payload(mm.encode_pcm_s16le(samples), "audio/pcm_s16le")
    np.testing.assert_array_equal(out, samples)

    rng = np.random.default_rng(9)
    frames = [_rand_img(rng, 3, 4) for _ in range(5)]
    dec = mm.decode_payload(mm.encode_ppm_seq(frames), "video/ppm-seq")
    assert len(dec) == 5
    for a, b in zip(dec, frames):
        np.testing.assert_array_equal(a, b)


def test_image_audio_video_features(spark):
    """Features computed through the executor mapInPandas path match
    hand-computed exact values for synthesized payloads."""
    rng = np.random.default_rng(10)
    img = _rand_img(rng, 5, 7)
    pcm = np.array([100, -200, 300], dtype="<i2")
    frames = [_rand_img(rng, 2, 3) for _ in range(4)]
    rows = [
        (1, "image/bmp", bytearray(mm.encode_bmp(img))),
        (2, "image/ppm", bytearray(mm.encode_ppm(img))),
        (3, "audio/pcm_s16le", bytearray(mm.encode_pcm_s16le(pcm))),
        (4, "video/ppm-seq", bytearray(mm.encode_ppm_seq(frames))),
    ]
    media = spark.createDataFrame(
        [(i, m, p, len(p), hashlib.md5(bytes(p)).hexdigest())
         for i, m, p in rows],
        schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}

    mean_px = int(img.sum(dtype=np.int64)) / img.size
    for mid in (1, 2):
        f = feats[mid]
        assert (f["f0"], f["f1"], f["f3"]) == (5.0, 7.0, 3.0)
        assert f["f2"] == pytest.approx(mean_px, abs=0)
    f3 = feats[3]
    assert f3["f0"] == 3.0 and f3["f1"] == pytest.approx(200.0)
    assert (f3["f2"], f3["f3"]) == (-200.0, 300.0)
    f4 = feats[4]
    total = sum(int(f.sum(dtype=np.int64)) for f in frames)
    assert (f4["f0"], f4["f1"], f4["f2"]) == (4.0, 2.0, 3.0)
    assert f4["f3"] == pytest.approx(total / sum(f.size for f in frames))


def test_resize_media_pipeline(spark):
    """decode → nearest resize → re-encode through Spark; resized
    payloads decode to the expected shape with exact NN pixel values;
    non-image rows pass through byte-identical."""
    rng = np.random.default_rng(11)
    img = _rand_img(rng, 8, 12)
    txt = b"pass through"
    media = spark.createDataFrame(
        [(1, "image/bmp", bytearray(mm.encode_bmp(img)), 0, "x"),
         (2, "text/utf-8", bytearray(txt), len(txt),
          hashlib.md5(txt).hexdigest())],
        schema=mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           mm.resize_media(media, 4, 6).collect()}
    resized = mm.decode_payload(out[1]["payload"], out[1]["modality"])
    assert out[1]["modality"] == "image/ppm" and resized.shape == (4, 6, 3)
    np.testing.assert_array_equal(resized, mm._resize_nearest(img, 4, 6))
    assert bytes(out[2]["payload"]) == txt and out[2]["modality"] == "text/utf-8"
    # metadata recomputed for the new payload
    assert out[1]["n_bytes"] == len(bytes(out[1]["payload"]))


def test_sample_frames(spark):
    rng = np.random.default_rng(12)
    frames = [_rand_img(rng, 2, 2) for _ in range(7)]
    vid = mm.encode_ppm_seq(frames)
    media = spark.createDataFrame(
        [(5, "video/ppm-seq", bytearray(vid), len(vid),
          hashlib.md5(vid).hexdigest())],
        schema=mm.MEDIA_SCHEMA)
    out = sorted(mm.sample_frames(media, every=3).collect(),
                 key=lambda r: r["media_id"])
    assert [r["media_id"] for r in out] == [5_000_000, 5_000_003, 5_000_006]
    for r, idx in zip(out, (0, 3, 6)):
        np.testing.assert_array_equal(
            mm.decode_payload(r["payload"], "image/ppm"), frames[idx])


def test_resize_nearest_identity_and_downscale():
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    np.testing.assert_array_equal(mm._resize_nearest(img, 2, 2), img)
    one = mm._resize_nearest(img, 1, 1)
    assert one.shape == (1, 1, 3)  # picks the pixel-center source


# --------------------------------------- PNG: real compressed codec (r4)


def test_png_roundtrip_all_filters_and_shapes():
    """Encode with each of the five scanline filters and round-trip:
    this drives every unfilter path (None/Sub/Up/Average/Paeth) over
    the inflate output."""
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (4, 6), (7, 3), (16, 16)]:
        img = _rand_img(rng, h, w)
        for ft in range(5):
            out = mm.decode_payload(
                mm.encode_png(img, filter_type=ft), "image/png")
            np.testing.assert_array_equal(out, img, err_msg=f"filter {ft}")


def test_png_gray_and_rgba_roundtrip():
    rng = np.random.default_rng(12)
    gray = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    for ft in range(5):
        out = mm.decode_payload(
            mm.encode_png(gray, filter_type=ft), "image/png")
        assert out.shape == (5, 9)
        np.testing.assert_array_equal(out, gray)
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    for ft in range(5):
        out = mm.decode_payload(
            mm.encode_png(rgba, filter_type=ft), "image/png")
        assert out.shape == (3, 4, 4)
        np.testing.assert_array_equal(out, rgba)


def test_png_palette_decode():
    """Hand-crafted color-type-3 PNG: indices expand through PLTE."""
    import struct
    import zlib

    from pandas_rust_algos_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk,
    )

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = mm.decode_payload(payload, "image/png")
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[0, 0, 255], [0, 255, 0], [255, 0, 0]]], dtype=np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    from pandas_rust_algos_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_payload(b"nope", "image/png")
    deep = (_PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="depth"):
        mm.decode_payload(deep, "image/png")


def test_png_features_match_bmp(spark):
    """The SAME pixels through the compressed (PNG) and uncompressed
    (BMP) codecs must featurize identically — including the pixel-CSV
    digest, which proves the inflate+unfilter is value-exact through
    the executor path."""
    rng = np.random.default_rng(13)
    img = _rand_img(rng, 6, 5)
    rows = [(1, "image/bmp", bytearray(mm.encode_bmp(img))),
            (2, "image/png", bytearray(mm.encode_png(img, filter_type=4)))]
    media = spark.createDataFrame(
        [(i, m, p, len(p), hashlib.md5(bytes(p)).hexdigest())
         for i, m, p in rows],
        schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    a, b = feats[1], feats[2]
    assert (a["f0"], a["f1"], a["f2"], a["f3"]) == \
        (b["f0"], b["f1"], b["f2"], b["f3"])
    assert a["check_md5"] == b["check_md5"] is not None
    # PNG payload is genuinely compressed vs the raw BMP raster
    assert feats[2]["n_bytes"] != feats[1]["n_bytes"]


def test_png_resize_media(spark):
    img = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(8, 4, 3)
    p = mm.encode_png(img, filter_type=2)
    media = spark.createDataFrame(
        [(9, "image/png", bytearray(p), len(p),
          hashlib.md5(p).hexdigest())], schema=mm.MEDIA_SCHEMA)
    out = mm.resize_media(media, 4, 2).collect()
    assert out[0]["modality"] == "image/ppm"
    resized = mm.decode_payload(out[0]["payload"], "image/ppm")
    assert resized.shape == (4, 2, 3)


def test_image_media_from_vecs_quantization(spark, sf_dir):
    """PNG ingestion from the embeddings fixture: decode through the
    feature path and verify the exact quantization contract the DuckDB
    oracle recomputes."""
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    media = mm.image_media_from_vecs(
        emb, "vec_id", "embedding", height=4, width=4)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(feats) == len(src)
    for vid, v in src.items():
        px = [int(np.floor(min(max(float(x), -1.0), 1.0) * 127.0)) + 128
              for x in v[:48]]
        r = feats[vid]
        assert (r["f0"], r["f1"], r["f3"]) == (4.0, 4.0, 3.0)
        assert r["f2"] == sum(px) / 48
        assert r["check_md5"] == hashlib.md5(
            ",".join(str(p) for p in px).encode()).hexdigest()


def test_wav_container_roundtrip_and_features(spark):
    """RIFF/WAVE framing around PCM-16: round-trip exact, tolerant of
    extra chunks, and features equal the raw-PCM path's."""
    import struct

    samples = np.array([0, -32768, 32767, 123, -456], dtype="<i2")
    wav = mm.encode_wav(samples, sample_rate=8000)
    np.testing.assert_array_equal(
        mm.decode_payload(wav, "audio/wav"), samples)
    # an extra odd-length chunk before data still parses (2-byte align)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    patched = wav[:12] + extra + wav[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    np.testing.assert_array_equal(
        mm.decode_payload(patched, "audio/wav"), samples)
    # non-PCM format code raises
    bad = bytearray(wav)
    bad[20] = 2  # fmt.audio_format = 2 (ADPCM)
    with pytest.raises(NotImplementedError, match="PCM-16 only"):
        mm.decode_payload(bytes(bad), "audio/wav")
    # executor featurize path: same features as raw PCM
    rows = [(1, "audio/pcm_s16le", bytearray(mm.encode_pcm_s16le(samples))),
            (2, "audio/wav", bytearray(wav))]
    media = spark.createDataFrame(
        [(i, m, p, len(p), hashlib.md5(bytes(p)).hexdigest())
         for i, m, p in rows], schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    for f in ("f0", "f1", "f2", "f3"):
        assert feats[1][f] == feats[2][f]


# ---------------------------------------- GIF: LZW compressed codec (r4)


def test_lzw_hand_traced_vector():
    """Pin spec conformance with a by-hand trace, not just round-trip
    self-consistency: indices [1,1,1,1] with min_code_size=2.
    clear=4 end=5, width starts at 3.
    encode: CLEAR(4); w grows 1,11; emit 1 (add 11->6); w=11 then
    111 unknown: emit 6 (add 111->7); w=1; final emit 1; END(5).
    codes: 4,1,6,1,5 at 3 bits LSB-first =
    bits 100 001 110 001 101 -> bytes 0x8C 0x5C 0x01... compute:
    acc: 4|1<<3|6<<6|1<<9|5<<12 = 4+8+384+512+20480 = 0x53\x8c? just
    assert decode(encode(x)) == x AND the exact code stream."""
    from pandas_rust_algos_spark.operators.multimodal import (
        _lzw_decode, _lzw_encode,
    )

    data = bytes([1, 1, 1, 1])
    enc = _lzw_encode(data, 2)
    # expected code sequence 4,1,6,1,5 packed LSB-first at 3 bits
    val = 4 | (1 << 3) | (6 << 6) | (1 << 9) | (5 << 12)
    expect = val.to_bytes(2, "little")
    assert enc == expect, (enc.hex(), expect.hex())
    assert _lzw_decode(enc, 2) == data


def test_lzw_roundtrip_adversarial():
    """Width bumps, KwKwK runs, 12-bit cap + mid-stream clear — all
    exercised by long high-entropy and long constant streams."""
    from pandas_rust_algos_spark.operators.multimodal import (
        _lzw_decode, _lzw_encode,
    )

    rng = np.random.default_rng(21)
    for n, k in [(10, 4), (1000, 16), (20000, 256), (60000, 7)]:
        data = rng.integers(0, k, size=n, dtype=np.uint8).tobytes()
        mcs = max(2, (k - 1).bit_length())
        assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data
    run = b"\x03" * 70000  # KwKwK chains + table-full resets
    assert _lzw_decode(_lzw_encode(run, 2), 2) == run


def test_gif_roundtrip_and_limits():
    rng = np.random.default_rng(22)
    # <=256 colors by construction: sample from a small random palette
    palette = rng.integers(0, 256, size=(11, 3), dtype=np.uint8)
    idx = rng.integers(0, 11, size=(9, 13))
    img = palette[idx]
    out = mm.decode_payload(mm.encode_gif(img), "image/gif")
    np.testing.assert_array_equal(out, img)
    # 1x1 and full-gray edge shapes
    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_payload(mm.encode_gif(one), "image/gif"), one)
    with pytest.raises(ValueError, match="256 colors"):
        big = np.arange(17 * 17 * 3, dtype=np.uint8).reshape(17, 17, 3)
        big[:, :, 0] = np.arange(17)[:, None]  # ensure > 256 distinct
        mm.encode_gif(
            np.stack(np.meshgrid(np.arange(32), np.arange(32)), -1)
            .astype(np.uint8).repeat(2, axis=-1)[:, :, :3] * 7)


def test_gif_features_match_bmp(spark):
    """Same pixels through GIF (LZW) and BMP (raw) featurize
    identically, pixel digest included."""
    palette = np.array([[0, 0, 0], [255, 10, 20], [1, 2, 3]], np.uint8)
    rng = np.random.default_rng(23)
    img = palette[rng.integers(0, 3, size=(6, 4))]
    rows = [(1, "image/bmp", bytearray(mm.encode_bmp(img))),
            (2, "image/gif", bytearray(mm.encode_gif(img)))]
    media = spark.createDataFrame(
        [(i, m, p, len(p), hashlib.md5(bytes(p)).hexdigest())
         for i, m, p in rows], schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    a, b = feats[1], feats[2]
    assert (a["f0"], a["f1"], a["f2"], a["f3"]) == \
        (b["f0"], b["f1"], b["f2"], b["f3"])
    assert a["check_md5"] == b["check_md5"] is not None


# ------------------------------------------------------------------ JPEG


def test_jpeg_lossless_roundtrip_exact():
    """SOF3 lossless: bit-exact round trip across shapes, channel
    counts, and all 7 predictors (ITU-T T.81 Annex H)."""
    from pandas_rust_algos_spark.operators import jpeg as J

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (1, 9), (6, 1), (4, 4, 3), (11, 5), (8, 8, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for pred in range(1, 8):
            out = J.decode_jpeg(J.encode_jpeg_lossless(img, predictor=pred))
            assert out.shape == img.shape
            np.testing.assert_array_equal(out, img)
    with pytest.raises(ValueError):
        J.encode_jpeg_lossless(np.zeros((2, 2), np.uint8), predictor=0)


def test_jpeg_lossless_byte_stuffing():
    """An all-255 image forces long runs of 1-bits in the entropy
    stream → stuffed 0xFF00 sequences the reader must consume."""
    from pandas_rust_algos_spark.operators import jpeg as J

    img = np.full((16, 16), 255, dtype=np.uint8)
    payload = J.encode_jpeg_lossless(img)
    np.testing.assert_array_equal(J.decode_jpeg(payload), img)


def test_jpeg_idct_matches_naive_definition():
    """The decoder's matrix IDCT equals the textbook quadruple-loop
    DCT-III definition (independent implementations, T.81 A.3.3)."""
    from pandas_rust_algos_spark.operators import jpeg as J

    rng = np.random.default_rng(11)
    coefs = rng.integers(-200, 200, size=(8, 8)).astype(np.float64)

    naive = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coefs[u, v]
                          * np.cos((2 * x + 1) * v * np.pi / 16)
                          * np.cos((2 * y + 1) * u * np.pi / 16))
            naive[y, x] = s / 4.0
    fast = J._idct_blocks(coefs[None, :, :])[0]
    np.testing.assert_allclose(fast, naive, atol=1e-9)
    # and FDCT inverts it
    np.testing.assert_allclose(
        J._fdct_blocks(fast[None, :, :])[0], coefs, atol=1e-9)


def test_jpeg_baseline_conformance_constant_block():
    """Hand-traced SOF0 vector: a constant-140 8x8 grayscale block at
    DC quant step 16 (quality=50 → Annex K base table, whose [0,0] is
    16) gives DCT DC = 8*(140-128) = 96, quantized 96/16 = 6 exactly,
    every AC 0 — decode must reproduce 16*6/8 + 128 = 140 everywhere:
    an exact round trip, every step integer-checkable by hand."""
    from pandas_rust_algos_spark.operators import jpeg as J

    img = np.full((8, 8), 140, dtype=np.uint8)
    payload = J.encode_jpeg_baseline(img, quality=50)
    out = J.decode_jpeg(payload)
    np.testing.assert_array_equal(out, img)
    # and the stream really carries a 6: decode the coefficients via an
    # independent minimal parse — DC category 3, magnitude bits 110
    # (the first Huffman code after SOS per K.3: cat 3 = '100')
    sos = payload.find(b"\xFF\xDA")
    # SOS for 1 comp: FFDA + len(=8) + body(6) → entropy at sos+10
    first_entropy_byte = payload[sos + 10]
    assert first_entropy_byte >> 2 == 0b100110  # huff(3)='100' + '110'=6


def test_jpeg_baseline_roundtrip_tolerance():
    """SOF0 is lossy by construction: smooth content must survive
    within small tolerance at 444 and 420, odd sizes included."""
    from pandas_rust_algos_spark.operators import jpeg as J

    y, x = np.mgrid[0:21, 0:35]
    img = np.stack([(x * 6) % 250, (y * 4) % 250, ((x + y) * 3) % 250],
                   axis=2).astype(np.uint8)
    img = img // 16 * 16
    for ss in ("444", "420"):
        out = J.decode_jpeg(J.encode_jpeg_baseline(
            img, quality=95, subsampling=ss))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 6.0, (ss, err.mean())
        assert err.max() <= 40, (ss, err.max())
    g = (np.mgrid[0:9, 0:13][0] * 20).astype(np.uint8)
    outg = J.decode_jpeg(J.encode_jpeg_baseline(g, quality=95))
    assert outg.shape == g.shape
    assert np.abs(outg.astype(int) - g.astype(int)).mean() < 4.0


def test_jpeg_decode_guards():
    from pandas_rust_algos_spark.operators import jpeg as J

    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x89PNG")
    # progressive (SOF2) must raise, not mis-decode
    payload = bytearray(J.encode_jpeg_baseline(
        np.zeros((8, 8), np.uint8)))
    idx = payload.find(b"\xFF\xC0")
    payload[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        J.encode_jpeg_baseline(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        J.encode_jpeg_baseline(np.zeros((4, 4), np.uint8),
                               subsampling="422")


def test_jpeg_features_match_bmp(spark):
    """Same pixels through lossless JPEG and BMP featurize identically
    through the Arrow-batched decode path, pixel digest included."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    from pandas_rust_algos_spark.operators.jpeg import encode_jpeg_lossless

    rows = [(1, "image/bmp", bytearray(mm.encode_bmp(img))),
            (2, "image/jpeg", bytearray(encode_jpeg_lossless(img)))]
    media = spark.createDataFrame(
        [(i, m, p, len(p), hashlib.md5(bytes(p)).hexdigest())
         for i, m, p in rows], schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    a, b = feats[1], feats[2]
    assert (a["f0"], a["f1"], a["f2"], a["f3"]) == \
        (b["f0"], b["f1"], b["f2"], b["f3"])
    assert a["check_md5"] == b["check_md5"] is not None


# ---------------------------------------------------------------- μ-law


def test_mulaw_code_space_roundtrip():
    """encode(decode(c)) == c for every code except the standard's
    −0 (0x7F), which re-encodes as +0 (0xFF) — both decode to 0."""
    codes = np.arange(256, dtype=np.uint8).tobytes()
    dec = mm.decode_payload(codes, "audio/mulaw")
    re = np.frombuffer(mm.encode_mulaw(dec), dtype=np.uint8)
    orig = np.frombuffer(codes, dtype=np.uint8)
    (diff,) = np.where(re != orig)
    assert list(diff) == [0x7F] and re[0x7F] == 0xFF
    assert dec[0x7F] == 0 and dec[0xFF] == 0
    assert dec.min() == -32124 and dec.max() == 32124


def test_mulaw_quantization_error_bounded():
    """Companding is log-quantized: relative error ≤ 1/16 for large
    samples, absolute error ≤ 4 near zero."""
    rng = np.random.default_rng(3)
    x = rng.integers(-32000, 32000, 5000).astype(np.int16)
    back = mm.decode_payload(mm.encode_mulaw(x), "audio/mulaw")
    err = np.abs(back.astype(np.int64) - x.astype(np.int64))
    rel = err / np.maximum(np.abs(x.astype(np.int64)), 132)
    assert rel.max() <= 1 / 16 + 1e-9
    small = np.arange(-30, 31, dtype=np.int16)
    backs = mm.decode_payload(mm.encode_mulaw(small), "audio/mulaw")
    assert np.abs(backs.astype(int) - small.astype(int)).max() <= 4


def test_mulaw_features_through_arrow_path(spark):
    codes = np.array([0, 63, 127, 128, 200, 255], dtype=np.uint8)
    payload = bytearray(codes.tobytes())
    media = spark.createDataFrame(
        [(1, "audio/mulaw", payload, len(payload),
          hashlib.md5(bytes(payload)).hexdigest())],
        schema=mm.MEDIA_SCHEMA)
    feat = mm.extract_features(media).collect()[0]
    dec = mm.decode_payload(bytes(payload), "audio/mulaw").astype(np.int64)
    assert feat["f0"] == 6.0
    assert feat["f1"] == pytest.approx(np.abs(dec).sum() / 6, abs=0)
    assert (feat["f2"], feat["f3"]) == (float(dec.min()), float(dec.max()))


def test_jpeg_lossless_property_roundtrip():
    """Property: ANY uint8 image round-trips SOF3 bit-exactly, any
    shape, channels, predictor (derandomized like the other hypothesis
    suites; HYPOTHESIS_EXPLORE=1 searches fresh inputs)."""
    import os as _os

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pandas_rust_algos_spark.operators import jpeg as J

    @settings(max_examples=12, deadline=None,
              derandomize=_os.environ.get("HYPOTHESIS_EXPLORE", "") != "1")
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        nc=st.sampled_from([1, 3, 4]),
        predictor=st.integers(1, 7),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, nc, predictor, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if nc == 1 else (h, w, nc)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = J.decode_jpeg(J.encode_jpeg_lossless(img, predictor=predictor))
        np.testing.assert_array_equal(out, img)

    check()


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn: a restart interval byte-aligns the entropy stream and
    resets DC prediction every N MCUs — decoded pixels must be
    IDENTICAL to the no-restart encoding of the same quantized
    coefficients, for gray and 4:2:0 color, across intervals."""
    from pandas_rust_algos_spark.operators import jpeg as J

    y, x = np.mgrid[0:24, 0:40]
    img = ((x * 5 + y * 3) % 256 // 16 * 16).astype(np.uint8)
    rgb = np.stack([img, 255 - img, img // 2], axis=2)
    for arr, ss in ((img, "444"), (rgb, "444"), (rgb, "420")):
        plain = J.decode_jpeg(
            J.encode_jpeg_baseline(arr, quality=85, subsampling=ss))
        for ri in (1, 2, 5):
            payload = J.encode_jpeg_baseline(
                arr, quality=85, subsampling=ss, restart_interval=ri)
            np.testing.assert_array_equal(J.decode_jpeg(payload), plain)
    # the stream really carries RSTn markers (not just a DRI header)
    import re

    payload = J.encode_jpeg_baseline(rgb, quality=85, restart_interval=2)
    assert b"\xFF\xDD" in payload
    assert len(re.findall(rb"\xFF[\xD0-\xD7]", payload)) >= 1
    # lossless + DRI is refused loudly (prediction reset unimplemented)
    lossless = bytearray(J.encode_jpeg_lossless(img))
    soi_end = 2
    dri = b"\xFF\xDD\x00\x04\x00\x02"
    spliced = bytes(lossless[:soi_end]) + dri + bytes(lossless[soi_end:])
    with pytest.raises(NotImplementedError, match="restart"):
        J.decode_jpeg(spliced)


def test_tiff_roundtrip_both_endians_and_guards():
    """Baseline TIFF codec: exact round trip for gray/RGB, single and
    multi strip, both byte orders; loud failures for non-TIFF bytes,
    unsupported compression, and truncated strips."""
    import numpy as np
    import pytest as _pytest

    from pandas_rust_algos_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.RandomState(3)
    for shape in [(5, 7), (5, 7, 3), (1, 1), (9, 2, 3)]:
        a = rng.randint(0, 256, shape).astype(np.uint8)
        for be in (False, True):
            for rps in (1, 3, 100):
                payload = encode_tiff(a, rows_per_strip=rps,
                                      big_endian=be)
                assert payload[:2] == (b"MM" if be else b"II")
                out = decode_tiff(payload)
                assert out.shape == a.shape and (out == a).all()

    with _pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + b"\x00" * 10)
    with _pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II\x2b\x00" + b"\x00" * 8)
    ok = bytearray(encode_tiff(np.zeros((4, 4), np.uint8)))
    # flip Compression (tag 259) to 7 (JPEG-in-TIFF, still out of
    # scope): must refuse loudly. (5 = LZW is decoded since r9.)
    import struct as _struct
    ifd = _struct.unpack("<L", ok[4:8])[0]
    n = _struct.unpack("<H", ok[ifd:ifd + 2])[0]
    for i in range(n):
        base = ifd + 2 + 12 * i
        if _struct.unpack("<H", ok[base:base + 2])[0] == 259:
            ok[base + 8:base + 10] = _struct.pack("<H", 7)
    with _pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(ok))
    # truncate the pixel strips: must refuse, not return garbage
    full = encode_tiff(np.arange(48, dtype=np.uint8).reshape(4, 12),
                       rows_per_strip=100)
    # strip data sits between header(8) and the IFD at the end
    cut = bytearray(full)
    cut[8:8 + 48] = cut[8:8 + 40]  # shorten payload region
    with _pytest.raises(Exception):
        decode_tiff(bytes(cut[:len(full) - 8]))


def test_tiff_features_match_png(spark):
    """image/tiff through the Spark feature path must agree with the
    PNG twin on every feature AND the pixel md5 (same pixels,
    different container + entropy coding)."""
    from pandas_rust_algos_spark.operators import multimodal as mm
    from pandas_rust_algos_spark.sources import load_table
    import os

    sf_dir = os.environ.get("PRA_TEST_SF_DIR", "/root/testdata/sf0.001")
    e = load_table(spark, sf_dir, "embeddings").limit(12)
    tiff = mm.extract_features(mm.image_media_from_vecs(
        e, "vec_id", "embedding", height=4, width=4, codec="tiff"))
    png = mm.extract_features(mm.image_media_from_vecs(
        e, "vec_id", "embedding", height=4, width=4, codec="png"))
    t = {r["media_id"]: (r["f0"], r["f1"], r["f2"], r["f3"],
                         r["check_md5"]) for r in tiff.collect()}
    p = {r["media_id"]: (r["f0"], r["f1"], r["f2"], r["f3"],
                         r["check_md5"]) for r in png.collect()}
    assert t == p and len(t) == 12


def test_tiff_word_alignment():
    """TIFF 6.0 requires values and the IFD on 2-byte boundaries; an
    odd-sized strip (5x7 grayscale = 35 bytes) must not push the
    out-of-line value areas or the IFD to odd offsets (ADVICE r6)."""
    import struct

    from pandas_rust_algos_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    for shape, rps in [((7, 5), 7), ((7, 5), 3), ((5, 3, 3), 1)]:
        a = (np.arange(int(np.prod(shape))) % 251).astype(
            np.uint8).reshape(shape)
        for be in (False, True):
            payload = encode_tiff(a, rows_per_strip=rps, big_endian=be)
            bo = ">" if be else "<"
            (ifd,) = struct.unpack(bo + "L", payload[4:8])
            assert ifd % 2 == 0, "IFD at odd offset"
            (n,) = struct.unpack(bo + "H", payload[ifd:ifd + 2])
            for i in range(n):
                base = ifd + 2 + 12 * i
                tag, typ, count = struct.unpack(
                    bo + "HHL", payload[base:base + 8])
                size = {1: 1, 2: 1, 3: 2, 4: 4}[typ] * count
                if size > 4:  # out-of-line value: offset must be even
                    (off,) = struct.unpack(
                        bo + "L", payload[base + 8:base + 12])
                    assert off % 2 == 0, f"tag {tag} value at odd offset"
            out = decode_tiff(payload)
            assert np.array_equal(out, a)


def test_tiff_lzw_spec_example_stream():
    """The 9-bit era of the TIFF-LZW writer pinned against the spec's
    own §13 example input <7 7 7 8 8 7 7 6 6>: the code sequence is
    Clear,7,258,8,8,258,6,6,EOI — hand-packed MSB-first below — and
    the decoder inverts it exactly (including the KwKwK-free early
    dictionary growth and the final partial-byte flush)."""
    from pandas_rust_algos_spark.operators.tiff import (
        _lzw_decode,
        _lzw_encode,
    )

    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    acc = 0
    for c in codes:
        acc = (acc << 9) | c
    nbits = 9 * len(codes)
    pad = (-nbits) % 8
    expected = (acc << pad).to_bytes((nbits + pad) // 8, "big")
    assert _lzw_encode(data) == expected
    assert _lzw_decode(expected) == data


def test_tiff_lzw_width_boundaries_and_reset():
    """Round trips that cross every code-width boundary (9→10→11→12)
    and the 4094-entry table reset: the writer widens at 2^n−1, the
    decoder — whose table adds lag by one code — at 2^n−2; a
    symmetric off-by-one would desynchronize the bit reader within a
    few codes of the boundary and corrupt everything after it."""
    from pandas_rust_algos_spark.operators.tiff import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.RandomState(42)
    for n in (700, 3_000, 40_000):  # ~9→10, →11, →12 + reset
        data = rng.randint(0, 256, n).astype(np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data)) == data
    runs = b"".join(bytes([i % 251]) * (i % 7 + 1)
                    for i in range(12_000))
    assert _lzw_decode(_lzw_encode(runs)) == runs


def test_tiff_lzw_roundtrip_and_predictor():
    """encode_tiff(compression='lzw') round-trips bit-exactly for
    gray + RGB, both endians, multi-strip, with and without the
    horizontal-differencing predictor; predictor=2 visibly shrinks a
    smooth gradient; invalid combinations refuse loudly."""
    from pandas_rust_algos_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, (11, 13)).astype(np.uint8)
    rgb = rng.randint(0, 256, (9, 5, 3)).astype(np.uint8)
    grad = np.add.outer(np.arange(16), np.arange(64)).astype(np.uint8)
    for a in (gray, rgb, grad):
        for be in (False, True):
            for pred in (1, 2):
                payload = encode_tiff(a, rows_per_strip=3,
                                      big_endian=be, compression="lzw",
                                      predictor=pred)
                assert np.array_equal(decode_tiff(payload), a)
    # the predictor earns its keep on smooth content
    plain = encode_tiff(grad, compression="lzw", predictor=1)
    pred2 = encode_tiff(grad, compression="lzw", predictor=2)
    assert len(pred2) < len(plain)
    with pytest.raises(ValueError, match="predictor"):
        encode_tiff(gray, compression="none", predictor=2)
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(gray, compression="zip")
