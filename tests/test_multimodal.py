"""Multimodal plumbing tests: binary columns + typed metadata through
Arrow-batched transforms; decode is the deterministic stub (codec libs
absent by design — see operators/multimodal.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    fake_decode,
    frame_sample,
    media_exact_dedup,
    media_features,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=32, seed=1).cache()


def test_schema_and_determinism(spark, media):
    assert media.schema == MEDIA_SCHEMA
    again = synthetic_media(spark, n=32, seed=1)
    a = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["content"]) for r in again.collect()}
    assert a == b  # seeded payloads reproducible


def test_media_features(media):
    out = media_features(media, n_features=8)
    rows = out.collect()
    assert len(rows) == 32
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] == 4096 for r in rows)
    # feature is a pure function of (content, meta): recompute one row
    raw = media.filter(F.col("media_id") == "image-0").first()
    arr = fake_decode(bytes(raw["content"]), raw["meta"])
    prof = arr.mean(axis=1)
    idx = np.linspace(0, len(prof) - 1, 8).round().astype(int)
    got = next(r for r in rows if r["media_id"] == "image-0")["feature"]
    assert np.allclose(got, prof[idx])


def test_decode_none_raises(media):
    with pytest.raises(NotImplementedError, match="codec"):
        media_features(media, decode=None)


def test_media_exact_dedup(spark, media):
    # duplicate two payloads under new ids
    dups = media.filter(F.col("media_id").isin(["image-0", "image-1"])).withColumn(
        "media_id", F.concat(F.lit("copy-"), F.col("media_id"))
    )
    all_media = media.unionByName(dups)
    out = media_exact_dedup(all_media)
    assert out.count() == 34
    flagged = {r["media_id"]: r for r in out.collect()}
    for a, b in [("image-0", "copy-image-0"), ("image-1", "copy-image-1")]:
        # same content hash, one canonical, exactly one flagged as dup
        assert flagged[a]["content_hash"] == flagged[b]["content_hash"]
        assert flagged[a]["canonical_id"] == flagged[b]["canonical_id"]
        assert flagged[a]["is_dup"] != flagged[b]["is_dup"]
    assert sum(1 for r in flagged.values() if r["is_dup"]) == 2


def test_frame_sample(media):
    out = frame_sample(media, n_frames=4)
    rows = out.collect()
    assert len(rows) == 32 * 4
    one = sorted(
        (r for r in rows if r["media_id"] == "image-3"), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in one] == [0, 1, 2, 3]
    assert one[0]["ts_ms"] == 0 and one[-1]["ts_ms"] == 999
    # frames differ (index mixed into the fake decode)
    assert one[0]["frame_feature"] != one[1]["frame_feature"]


def test_wav_decode_real_codec_through_arrow_path(spark):
    """The REAL decode path: stdlib-decoded PCM WAV bytes flow through
    the exact same mapInPandas plumbing as the stub — media_features
    with decode=wav_decode yields an amplitude-envelope feature whose
    values match a driver-side decode of the same bytes."""
    from picovdb_spark.operators.multimodal import synthetic_wav, wav_decode

    wavs = synthetic_wav(spark, n=8, seed=3)
    out = {r["media_id"]: r for r in media_features(wavs, decode=wav_decode).collect()}
    assert len(out) == 8
    raw = {r["media_id"]: bytes(r["content"]) for r in wavs.collect()}
    for mid, b in raw.items():
        arr = wav_decode(b, None)
        assert arr.shape == (2000, 1) and arr.dtype == np.float64
        assert float(np.abs(arr).max()) <= 0.5
        prof = arr.mean(axis=1)
        idx = np.linspace(0, len(prof) - 1, 8).round().astype(int)
        expect = [float(x) for x in prof[idx]]
        assert out[mid]["feature"] == pytest.approx(expect)
        assert out[mid]["n_bytes"] == len(b)
    # distinct tones -> distinct content hashes (real dedup semantics)
    assert len({r["content_hash"] for r in out.values()}) == 8


def test_wav_decode_sample_widths():
    """8/16/32-bit PCM all scale to [-1, 1); unsupported widths raise."""
    import io
    import wave as _wave

    from picovdb_spark.operators.multimodal import wav_decode

    def make(width, data):
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(8000)
            w.writeframes(data)
        return buf.getvalue()

    a8 = wav_decode(make(1, bytes([0, 128, 255])), None)
    assert a8[:, 0] == pytest.approx([-1.0, 0.0, 127 / 128])
    a16 = wav_decode(make(2, np.array([-32768, 0, 32767], "<i2").tobytes()), None)
    assert a16[:, 0] == pytest.approx([-1.0, 0.0, 32767 / 32768])
    a32 = wav_decode(
        make(4, np.array([-(2**31), 0, 2**31 - 1], "<i4").tobytes()), None
    )
    assert a32[:, 0] == pytest.approx([-1.0, 0.0, (2**31 - 1) / 2**31])
    with pytest.raises(ValueError, match="sample width"):
        wav_decode(make(3, b"\x00" * 6), None)


def test_wav_decode_zero_frame_wav_yields_defined_feature(spark):
    """A valid RIFF WAV with an empty data chunk decodes to (0, ch);
    media_features must emit a defined all-zero feature, not die in the
    resample (np.linspace over an empty profile indexes at -1)."""
    import io
    import wave as _wave

    from picovdb_spark.operators.multimodal import wav_decode

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
    empty = buf.getvalue()
    assert wav_decode(empty, None).shape == (0, 1)
    media = spark.createDataFrame(
        [("a0", "audio", bytearray(empty), ("audio/wav", None, None, 0, 8000))],
        schema=MEDIA_SCHEMA,
    )
    row = media_features(media, decode=wav_decode).collect()[0]
    assert row["feature"] == [0.0] * 8
    assert row["n_bytes"] == len(empty)


def test_media_features_on_error_null_isolates_bad_payloads(spark):
    """on_error='null': one malformed payload (truncated/garbage bytes
    through the real decoder) survives as a feature=NULL row with its
    content hash intact, instead of killing the job; on_error='raise'
    (default) keeps strict fail-fast."""
    from picovdb_spark.operators.multimodal import synthetic_wav, wav_decode

    good = synthetic_wav(spark, n=2, seed=5)
    bad = spark.createDataFrame(
        [("bad-0", "audio", bytearray(b"not a riff file"), ("audio/wav", None, None, 0, 8000))],
        schema=MEDIA_SCHEMA,
    )
    media = good.unionByName(bad)
    rows = {
        r["media_id"]: r
        for r in media_features(media, decode=wav_decode, on_error="null").collect()
    }
    assert len(rows) == 3
    assert rows["bad-0"]["feature"] is None
    assert rows["bad-0"]["n_bytes"] == 15 and rows["bad-0"]["content_hash"]
    assert all(rows[f"audio-{i}"]["feature"] is not None for i in range(2))
    with pytest.raises(Exception):
        media_features(media, decode=wav_decode).collect()
    with pytest.raises(ValueError, match="on_error"):
        media_features(media, decode=wav_decode, on_error="skip")


def test_media_features_programming_errors_surface_even_under_null(spark):
    """on_error='null' quarantines DATA errors only (round-8 advice): a
    decoder that is itself broken — raising TypeError/NameError/
    AttributeError on every record — must surface, or a systematically
    broken decoder would silently null 100% of the corpus's features,
    indistinguishable from routinely bad bytes."""
    from picovdb_spark.operators.multimodal import synthetic_wav

    media = synthetic_wav(spark, n=2, seed=9)

    def broken_decoder(content, meta):  # typo'd API: programming error
        raise AttributeError("'bytes' object has no attribute 'frames'")

    with pytest.raises(Exception):  # Py4J wraps the AttributeError
        media_features(media, decode=broken_decoder, on_error="null").collect()

    def data_error_decoder(content, meta):
        raise ValueError("bad magic")

    rows = media_features(
        media, decode=data_error_decoder, on_error="null"
    ).collect()
    assert len(rows) == 2 and all(r["feature"] is None for r in rows)


def test_png_decode_real_codec_roundtrip(spark):
    """`png_decode` is a REAL stdlib codec (zlib inflate + spec
    unfiltering) through the same Arrow path as the stubs: a
    `synthetic_png` corpus (real RGB PNG bytes, CRCs verified) decodes
    to exactly the raster the writer embedded, and `media_features`
    over it yields the per-pixel channel-mean profile."""
    from picovdb_spark.operators.multimodal import png_decode, synthetic_png

    media = synthetic_png(spark, n=3, seed=7, width=16, height=12)
    # driver-side exactness: decode one payload and compare to the
    # deterministic raster the writer built from the same (seed, i)
    row = media.filter(F.col("media_id") == "image-1").collect()[0]
    arr = png_decode(bytes(row["content"]), row["meta"].asDict())
    rng = np.random.default_rng((7, 1))
    img = rng.integers(0, 256, size=(12, 16 * 3), dtype=np.uint8)
    expect = img.reshape(12 * 16, 3).astype(np.float64) / 256.0
    assert arr.shape == (12 * 16, 3)
    assert np.array_equal(arr, expect)
    # distributed path: same decode slot, Arrow-batched
    feats = {
        r["media_id"]: r
        for r in media_features(media, decode=png_decode, n_features=4).collect()
    }
    assert len(feats) == 3
    want_prof = expect.mean(axis=1)
    idx = np.linspace(0, len(want_prof) - 1, 4).round().astype(int)
    assert np.allclose(feats["image-1"]["feature"], want_prof[idx])


def test_png_decode_reverses_all_filter_types():
    """Each PNG filter type (Sub/Up/Average/Paeth) round-trips: filter a
    known raster per the spec, wrap it in a valid PNG, and assert
    `png_decode` reconstructs the original bytes."""
    import struct
    import zlib

    from picovdb_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(42)
    h, w, ch = 6, 5, 3
    img = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8).astype(int)
    stride, bpp = w * ch, ch

    def filt_row(ftype, cur, prev):
        out = bytearray([ftype])
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((cur[x] - pred) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = [0] * stride
    for y in range(h):
        cur = list(img[y])
        raw += filt_row([0, 1, 2, 3, 4, 4][y], cur, prev)
        prev = cur

    def _chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    arr = png_decode(png, {})
    assert np.array_equal(
        (arr * 256.0).round().astype(int).reshape(h, stride), img
    )


def test_png_decode_rejects_malformed_and_quarantines(spark):
    """Bad PNG bytes raise ValueError/zlib.error (DATA errors), so
    `media_features(on_error='null')` quarantines them per record —
    exactly the wav_decode contract, now for images."""
    import struct
    import zlib

    from picovdb_spark.operators.multimodal import png_decode, synthetic_png

    with pytest.raises(ValueError, match="bad signature"):
        png_decode(b"not a png at all", {})
    # corrupt a real PNG's CRC
    good = bytes(synthetic_png(spark, n=1).collect()[0]["content"])
    corrupted = bytearray(good)
    corrupted[-5] ^= 0xFF  # IEND CRC byte
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(corrupted), {})

    bad = spark.createDataFrame(
        [("img-bad", "image", bytearray(b"JFIF junk"), ("image/png", 8, 8, None, None))],
        schema=MEDIA_SCHEMA,
    )
    media = synthetic_png(spark, n=2, seed=3).unionByName(bad)
    rows = {
        r["media_id"]: r
        for r in media_features(media, decode=png_decode, on_error="null").collect()
    }
    assert rows["img-bad"]["feature"] is None
    assert rows["img-bad"]["content_hash"] and rows["img-bad"]["n_bytes"] == 9
    assert all(rows[f"image-{i}"]["feature"] is not None for i in range(2))


def test_avi_decode_real_codec_roundtrip(spark):
    """synthetic_avi content is a REAL uncompressed RIFF/AVI; _avi_parse
    round-trips the seeded rasters bit-exactly (bottom-up BGR + stride
    padding undone), and media_features over avi_decode produces the
    temporal mean-intensity envelope through the same Arrow path as the
    stubs."""
    from picovdb_spark.operators.multimodal import (
        _avi_parse,
        avi_decode,
        synthetic_avi,
    )

    media = synthetic_avi(spark, n=4, seed=7, n_video_frames=12, fps=10)
    raw = {r["media_id"]: (bytes(r["content"]), r["meta"]) for r in media.collect()}

    # bit-exact raster round-trip against the seeded source
    content, meta = raw["video-2"]
    frames, fps = _avi_parse(content)
    rng = np.random.default_rng((7, 2))
    want = rng.integers(0, 256, size=(12, 16, 24, 3), dtype=np.uint8)
    assert frames.shape == (12, 16, 24, 3) and fps == 10.0
    assert np.array_equal(frames, want)

    # the media_features slot: row profile == per-frame mean intensity
    out = {
        r["media_id"]: r
        for r in media_features(media, decode=avi_decode, n_features=6).collect()
    }
    arr = avi_decode(content, meta)
    assert arr.shape == (12, 16 * 24 * 3)
    prof = arr.mean(axis=1)
    idx = np.linspace(0, len(prof) - 1, 6).round().astype(int)
    assert np.allclose(out["video-2"]["feature"], prof[idx])
    assert all(len(r["feature"]) == 6 for r in out.values())


def test_avi_orientation_and_channel_order():
    """Plant a single red pixel at the TOP-LEFT of frame 0: after the
    bottom-up/BGR undo it must come back at [0, 0, 0] with channel
    order RGB — pinning the two raster transforms a naive parser gets
    wrong. Uses the shared `avi_bytes` writer (same code path as
    `synthetic_avi`), so fixture and pin can't drift."""
    from picovdb_spark.operators.multimodal import _avi_parse, avi_bytes

    raster = np.zeros((1, 4, 4, 3), dtype=np.uint8)
    raster[0, 0, 0] = (255, 0, 0)  # pure red, top-left, RGB

    frames, fps = _avi_parse(avi_bytes(raster, fps=10))
    assert frames.shape == (1, 4, 4, 3) and fps == 10.0
    assert tuple(frames[0, 0, 0]) == (255, 0, 0)
    assert frames[0].sum() == 255  # nothing bled anywhere else


def test_frame_sample_real_avi_frames(spark):
    """frame_sample(frame_decode=avi_frames) samples REAL decoded frames
    at linspace over the actual frame count; features match a local
    recompute of the same reduction, ts_ms spreads meta.duration_ms."""
    from picovdb_spark.operators.multimodal import avi_frames, synthetic_avi

    media = synthetic_avi(spark, n=3, seed=11, n_video_frames=10, fps=5)
    out = frame_sample(media, n_frames=4, frame_decode=avi_frames)
    rows = sorted(
        (r for r in out.collect() if r["media_id"] == "video-1"),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]

    raw = media.filter(F.col("media_id") == "video-1").first()
    stack = avi_frames(bytes(raw["content"]), raw["meta"])
    assert stack.shape == (10, 16 * 24, 3)
    positions = np.linspace(0, 9, 4).round().astype(int)  # 0, 3, 6, 9
    duration = raw["meta"]["duration_ms"]  # 2000 ms at 10 frames / 5 fps
    for r, fidx in zip(rows, positions):
        # WHOLE-frame per-channel mean — every pixel contributes, so a
        # letterboxed corner can't blind the feature
        want = [float(x) for x in stack[fidx].mean(axis=0)]
        assert len(want) == 3
        assert np.allclose(r["frame_feature"], want)
        assert r["ts_ms"] == int(round(fidx * duration / 10))
    # distinct frames -> distinct features (unlike a stub roll of 4 rows)
    assert rows[0]["frame_feature"] != rows[-1]["frame_feature"]


def test_avi_decode_rejects_malformed_and_quarantines(spark):
    """Bad AVI bytes raise ValueError (DATA errors) so
    media_features(on_error='null') quarantines per record — the same
    contract as wav_decode/png_decode, now for video. Compressed ('..dc')
    frames are an honest ValueError naming the pyav integration point."""
    from picovdb_spark.operators.multimodal import (
        _avi_parse,
        avi_decode,
        synthetic_avi,
    )

    with pytest.raises(ValueError, match="RIFF"):
        _avi_parse(b"MP4 junk that is not RIFF")
    good = bytes(synthetic_avi(spark, n=1).collect()[0]["content"])
    with pytest.raises(ValueError, match="truncated|missing"):
        _avi_parse(good[:64])
    with pytest.raises(ValueError, match="pyav"):
        _avi_parse(good.replace(b"00db", b"00dc", 1))

    bad = spark.createDataFrame(
        [
            (
                "vid-bad",
                "video",
                bytearray(b"\x00\x00\x00 ftypisom junk"),
                ("video/mp4", 24, 16, 1000, None),
            )
        ],
        schema=MEDIA_SCHEMA,
    )
    media = synthetic_avi(spark, n=2, seed=3).unionByName(bad)
    rows = {
        r["media_id"]: r
        for r in media_features(media, decode=avi_decode, on_error="null").collect()
    }
    assert rows["vid-bad"]["feature"] is None
    assert rows["vid-bad"]["content_hash"] is not None
    assert all(rows[f"video-{i}"]["feature"] is not None for i in range(2))


def test_frame_sample_zero_frame_custom_decoder_yields_no_rows(spark):
    """A custom frame_decode returning an EMPTY stack (frameless
    container) must produce zero rows for that doc — not an IndexError
    inside the Arrow kernel. (avi_frames itself raises on frameless AVIs
    upstream; this pins the contract for plug-in decoders.)"""
    from picovdb_spark.operators.multimodal import synthetic_avi

    media = synthetic_avi(spark, n=2, seed=1)

    def empty_stack(content, meta):
        return np.empty((0, 4, 3), dtype=np.float64)

    assert frame_sample(media, n_frames=4, frame_decode=empty_stack).count() == 0


def test_avi_multistream_and_zero_area():
    """Stream-indexed chunk matching: a second stream's '01db'/'01dc'
    chunks are IGNORED (not concatenated into the frame stack, not a
    spurious rejection), and zero-area dimensions are a ValueError (a
    zero-area raster would flow to NaN features and dodge the
    on_error='null' quarantine)."""
    import struct

    from picovdb_spark.operators.multimodal import _avi_parse, avi_bytes

    rasters = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    rasters[0, 0, 0] = (9, 8, 7)
    base = avi_bytes(rasters, fps=10)

    # splice a foreign stream's chunks into the movi list: '01dc'
    # (compressed, stream 1) must NOT reject the file, '01db' must NOT
    # add frames
    def _chunk(fourcc, data):
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    foreign = _chunk(b"01dc", b"\x01\x02") + _chunk(b"01db", b"\x03\x04\x05\x06")
    movi_at = base.index(b"movi")
    # grow the movi LIST and RIFF sizes to cover the spliced chunks
    (movi_size,) = struct.unpack("<I", base[movi_at - 4 : movi_at])
    patched = (
        base[: movi_at - 4]
        + struct.pack("<I", movi_size + len(foreign))
        + base[movi_at : movi_at + movi_size]
        + foreign
    )
    (riff_size,) = struct.unpack("<I", base[4:8])
    patched = patched[:4] + struct.pack("<I", riff_size + len(foreign)) + patched[8:]

    frames, _ = _avi_parse(patched)
    assert frames.shape == (2, 4, 4, 3)  # exactly the stream-0 frames
    assert tuple(frames[0, 0, 0]) == (9, 8, 7)

    # zero-area dims: crafted header passes the length checks but must
    # be rejected, not decoded into an (n, h, 0, 3) NaN source
    zero = avi_bytes(np.zeros((1, 4, 0, 3), dtype=np.uint8), fps=10)
    with pytest.raises(ValueError, match="zero-area"):
        _avi_parse(zero)


def test_avi_second_video_stream_strf_does_not_override_dims():
    """A second 'vids' stream's strf (different dimensions) must not
    overwrite the ELECTED (first) stream's dims — its frames are ignored
    by the stream-indexed chunk matching, so its header must be too."""
    import struct

    from picovdb_spark.operators.multimodal import _avi_parse, avi_bytes

    rasters = np.zeros((1, 4, 4, 3), dtype=np.uint8)
    rasters[0, 1, 2] = (5, 6, 7)
    base = avi_bytes(rasters, fps=10)

    def _chunk(fourcc, data):
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def _list(t, p):
        return _chunk(b"LIST", t + p)

    # second video stream: 8x8, also BI_RGB — would change stride*height
    strh2 = (
        b"vids" + b"DIB "
        + struct.pack("<IIIIIIIIII", 0, 0, 0, 1, 10, 0, 1, 0, 0, 0)
        + struct.pack("<4H", 0, 0, 8, 8)
    )
    strf2 = struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, 24 * 8, 0, 0, 0, 0)
    strl2 = _list(b"strl", _chunk(b"strh", strh2) + _chunk(b"strf", strf2))

    # splice the second strl into hdrl, before movi
    hdrl_at = base.index(b"hdrl")
    (hdrl_size,) = struct.unpack("<I", base[hdrl_at - 4 : hdrl_at])
    hdrl_end = hdrl_at + hdrl_size
    patched = (
        base[: hdrl_at - 4]
        + struct.pack("<I", hdrl_size + len(strl2))
        + base[hdrl_at:hdrl_end]
        + strl2
        + base[hdrl_end:]
    )
    (riff_size,) = struct.unpack("<I", base[4:8])
    patched = patched[:4] + struct.pack("<I", riff_size + len(strl2)) + patched[8:]

    frames, _ = _avi_parse(patched)
    assert frames.shape == (1, 4, 4, 3)  # elected stream's dims survive
    assert tuple(frames[0, 1, 2]) == (5, 6, 7)


def test_avi_missing_video_strf_not_adopted_from_audio_strl():
    """strf acceptance is scoped to the elected strh's own strl (round-9
    advice): a malformed file whose 'vids' strh has NO strf, followed by
    an audio strl whose strf is 40+ bytes (WAVEFORMATEXTENSIBLE-sized),
    must fail with 'missing video stream header', not parse the audio
    strf as a BITMAPINFOHEADER and report garbage dimensions."""
    import struct

    from picovdb_spark.operators.multimodal import _avi_parse

    def _chunk(fourcc, data):
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def _list(t, p):
        return _chunk(b"LIST", t + p)

    strh_vid = (
        b"vids" + b"DIB "
        + struct.pack("<IIIIIIIIII", 0, 0, 0, 1, 10, 0, 1, 0, 0, 0)
        + struct.pack("<4H", 0, 0, 4, 4)
    )
    strh_aud = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IIIIIIIIII", 0, 0, 0, 1, 8000, 0, 8000, 0, 0, 0)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    # a 40-byte audio strf that WOULD decode as a plausible 8x8 24-bit
    # BITMAPINFOHEADER if the stale await_vid_strf flag leaked into
    # this strl — the exact garbage-dims failure the scoping prevents
    strf_aud = struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, 24 * 8, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", struct.pack("<I", 100000) + b"\x00" * 52)
        + _list(b"strl", _chunk(b"strh", strh_vid))  # vids strh, NO strf
        + _list(b"strl", _chunk(b"strh", strh_aud) + _chunk(b"strf", strf_aud)),
    )
    movi = _list(b"movi", _chunk(b"00db", b"\x00" * 48))
    payload = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(payload)) + payload

    with pytest.raises(ValueError, match="missing video stream"):
        _avi_parse(avi)


def test_frame_sample_timed_decoder_falls_back_to_container_fps(spark):
    """ts_ms fallback chain (round-9 advice): when meta.duration_ms is
    NULL, frame_decode=avi_frames_timed stamps ts_ms from the CONTAINER
    fps the AVI headers carry, while the stack-only avi_frames route
    degrades to the documented ts_ms=0 — features identical either way."""
    from picovdb_spark.operators.multimodal import (
        avi_frames,
        avi_frames_timed,
        synthetic_avi,
    )

    media = synthetic_avi(spark, n=1, seed=2, n_video_frames=10, fps=5)
    null_dur = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )
    timed = sorted(
        frame_sample(null_dur, n_frames=4, frame_decode=avi_frames_timed).collect(),
        key=lambda r: r["frame_idx"],
    )
    stack_only = sorted(
        frame_sample(null_dur, n_frames=4, frame_decode=avi_frames).collect(),
        key=lambda r: r["frame_idx"],
    )
    # linspace(0, 9, 4) -> frames 0, 3, 6, 9 at 5 fps -> 0/600/1200/1800 ms
    assert [r["ts_ms"] for r in timed] == [0, 600, 1200, 1800]
    assert [r["ts_ms"] for r in stack_only] == [0, 0, 0, 0]  # documented
    for a, b in zip(timed, stack_only):
        assert a["frame_feature"] == b["frame_feature"]
    # with duration_ms present, meta stays authoritative for both forms
    with_dur = sorted(
        frame_sample(media, n_frames=4, frame_decode=avi_frames_timed).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["ts_ms"] for r in with_dur] == [0, 600, 1200, 1800]


def test_media_quarantine_report(spark):
    """media_quarantine_report turns the on_error='null' output into the
    run-report dict (total / quarantined / rate, split per modality) so
    a broken decoder is one artifact read away — round-9 verdict #6."""
    from picovdb_spark.operators.multimodal import (
        media_quarantine_report,
        synthetic_wav,
        wav_decode,
    )

    good = synthetic_wav(spark, n=3, seed=5)
    bad = spark.createDataFrame(
        [
            (
                "bad-0",
                "audio",
                bytearray(b"not a riff file"),
                ("audio/wav", None, None, 0, 8000),
            )
        ],
        schema=MEDIA_SCHEMA,
    )
    feats = media_features(
        good.unionByName(bad), decode=wav_decode, on_error="null"
    )
    report = media_quarantine_report(feats)
    assert report["total"] == 4
    assert report["quarantined"] == 1
    assert report["rate"] == pytest.approx(0.25)
    assert report["by_modality"] == {
        "audio": {"total": 4, "quarantined": 1}
    }
    # NULL modality (quarantine-grade metadata) must be reported, not
    # TypeError the sort — the report function takes any features-shaped
    # frame, not only media_features output
    loose = spark.createDataFrame(
        [("x-0", None, 3, "h", None), ("x-1", "image", 3, "h", [1.0])],
        "media_id string, modality string, n_bytes int, "
        "content_hash string, feature array<double>",
    )
    rep2 = media_quarantine_report(loose)
    assert rep2["total"] == 2 and rep2["quarantined"] == 1
    assert rep2["by_modality"] == {
        "image": {"total": 1, "quarantined": 0},
        None: {"total": 1, "quarantined": 1},
    }
