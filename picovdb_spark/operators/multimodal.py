"""Multimodal (image/audio/video) columns for a training-data pipeline.

Media ride through the engine as opaque `binary` columns plus a typed
metadata struct — the Spark-native pattern (same shape as
`spark.read.format("binaryFile")` and the petastorm/webdataset-on-parquet
convention). All transforms are Arrow-batched `mapInPandas` so bytes
never round-trip row-at-a-time through Python.

ALL THREE modalities have REAL decoders on the standard library alone:
`wav_decode` (PCM WAV via ``wave``), `png_decode` (8-bit PNG via
``zlib`` inflate + spec unfiltering), and `avi_decode`/`avi_frames`
(uncompressed 24-bit RIFF/AVI via ``struct`` chunk walk), each with a
real-bytes fixture (`synthetic_wav` / `synthetic_png` /
`synthetic_avi`) and each plugging into the exact same `decode` slot
as the stubs. COMPRESSED formats (JPEG, H.264) need codec libraries
NOT in this container, so those remain STUBBED:
`decode=None` raises NotImplementedError naming the library to plug
in, while `fake_decode` provides the deterministic stand-in used by
tests and the oracle-checked gate entries (byte-seeded, reproducible).
The Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is identical for the fakes, the stdlib codecs, and a
production Pillow/ffmpeg kernel; swapping is a one-line change at the
call site.

The reference engine has no media surface (SURVEY.md §2.4); this module
is part of the §7.4 scale-out extensions."""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthetic_media(
    spark: SparkSession, n: int = 64, *, modality: str = "image", seed: int = 0, payload: int = 4096
) -> DataFrame:
    """Deterministic fake media corpus (no codec libs in the container;
    payloads are seeded random bytes with plausible metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        content = rng.integers(0, 256, size=payload, dtype=np.uint8).tobytes()
        rows.append(
            (
                f"{modality}-{i}",
                modality,
                bytearray(content),
                ("application/octet-stream", 64, 48, 1000, 16000),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def fake_decode(content: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decoder shaped by the metadata: row ``i``
    of the decoded (h, w) array is the constant
    ``int(md5(f"{content.hex()}:{i}")[:12], 16) / 2**48`` — a pure
    function of (bytes, meta) whose row means are exactly representable
    md5-substring integers over 2^48. That makes every decode-dependent
    operator ORACLE-EXPRESSIBLE: DuckDB can rebuild the same values with
    ``('0x' || substr(md5(lower(hex(content)) || ':' || i), 1, 12))::BIGINT``
    (see __spark_entry__'s media entries). Replace with a real codec
    (PIL.Image.open / soundfile.read / av.open) in production."""
    h = int(meta["height"] or 8)
    w = int(meta["width"] or 8)
    key = content.hex()
    rows = np.array(
        [
            int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:12], 16)
            / float(1 << 48)
            for i in range(h)
        ],
        dtype=np.float64,
    )
    return np.repeat(rows[:, None], w, axis=1)


def wav_decode(content: bytes, meta) -> np.ndarray:
    """REAL codec decode for PCM WAV (RIFF) audio — the one modality
    this environment can decode with the standard library alone (the
    ``wave`` module; image/video decode still needs Pillow/pyav and
    stays env-stubbed). Returns (n_frames, n_channels) float64 samples
    scaled to [-1, 1), so `media_features`' row-mean profile becomes a
    channel-averaged amplitude envelope resampled to `n_features`.

    Plugs into the same ``decode`` slot as `fake_decode` — the whole
    point of the callable contract: the Arrow plumbing (batching,
    schema, partitioning) is identical for the fake, the stdlib WAV
    path, and a production Pillow/ffmpeg kernel. `meta` is accepted for
    signature parity; the WAV header itself is authoritative."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(bytes(content))) as w:
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sw} bytes")
    return arr.reshape(-1, ch)


def synthetic_wav(
    spark: SparkSession,
    n: int = 16,
    *,
    seed: int = 0,
    sample_rate: int = 8000,
    duration_ms: int = 250,
) -> DataFrame:
    """Deterministic corpus of REAL 16-bit mono PCM WAV files (sine
    tones, frequency seeded per id) in the `MEDIA_SCHEMA` shape — the
    fixture for exercising `wav_decode` through the same Arrow path the
    stubs use. Unlike `synthetic_media`, the content column holds valid
    RIFF bytes a real decoder accepts."""
    import io
    import wave as _wave

    rng = np.random.default_rng(seed)
    n_frames = sample_rate * duration_ms // 1000
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    rows = []
    for i in range(n):
        freq = 200.0 + float(rng.integers(0, 1800))
        pcm = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767.0).astype("<i2")
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        rows.append(
            (
                f"audio-{i}",
                "audio",
                bytearray(buf.getvalue()),
                ("audio/wav", None, None, duration_ms, sample_rate),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def png_decode(content: bytes, meta) -> np.ndarray:
    """REAL codec decode for 8-bit PNG images on the standard library
    alone (``zlib`` inflate + spec unfiltering — no Pillow needed), the
    image twin of `wav_decode`: chunk parse with CRC verification, IDAT
    inflate, per-scanline reversal of all five PNG filter types
    (None/Sub/Up/Average/Paeth), supporting color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA) at bit depth 8, non-interlaced.
    Returns (H*W, channels) float64 in [0, 1), so `media_features`'
    row-mean profile becomes a per-pixel channel-mean (luminance-ish)
    raster scan resampled to `n_features`.

    Plugs into the same ``decode`` slot as `fake_decode` / `wav_decode`
    — the Arrow plumbing is identical; a production Pillow kernel is a
    one-line swap. Correctness-first, not throughput-first: the
    unfilter loop is per-scanline Python (fine for fixtures and CI; a
    100 TB image corpus wants the Pillow/torchvision path on this same
    slot). Malformed bytes raise ValueError/zlib.error — exactly the
    DATA-error classes `media_features(on_error="null")` quarantines.
    `meta` is accepted for signature parity; the IHDR is authoritative."""
    import struct
    import zlib

    b = bytes(content)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    ihdr = None
    idat = bytearray()
    pos = 8
    while pos + 12 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            raise ValueError("truncated PNG chunk")
        (want_crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if (zlib.crc32(ctype + data) & 0xFFFFFFFF) != want_crc:
            raise ValueError(f"PNG CRC mismatch in chunk {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant: depth={depth} interlace={interlace} "
            "(8-bit non-interlaced only; use Pillow for the rest)"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color} (no PLTE support)")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload length mismatch")
    bpp = channels  # bytes per pixel at depth 8
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = row[0]
        cur = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int64)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h * w, channels).astype(np.float64) / 256.0


def synthetic_png(
    spark: SparkSession,
    n: int = 16,
    *,
    seed: int = 0,
    width: int = 32,
    height: int = 24,
) -> DataFrame:
    """Deterministic corpus of REAL 8-bit RGB PNG files (seeded random
    rasters, filter-0 scanlines, correct CRCs) in the `MEDIA_SCHEMA`
    shape — the image twin of `synthetic_wav`: content a real decoder
    accepts, exercised through the same Arrow path as the stubs."""
    import struct
    import zlib

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rows = []
    for i in range(n):
        rng = np.random.default_rng((seed, i))
        img = rng.integers(0, 256, size=(height, width * 3), dtype=np.uint8)
        raw = b"".join(b"\x00" + img[y].tobytes() for y in range(height))
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        rows.append(
            (
                f"image-{i}",
                "image",
                bytearray(png),
                ("image/png", width, height, None, None),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _avi_parse(content: bytes) -> tuple[np.ndarray, float]:
    """Parse an uncompressed (BI_RGB, 24-bit) RIFF/AVI container into
    (frames, fps): frames is a (n_frames, H, W, 3) uint8 RGB top-down
    stack; fps comes from the 'vids' stream header's dwRate/dwScale
    (falling back to avih's dwMicroSecPerFrame). Shared core for
    `avi_decode` (media_features slot) and `avi_frames` (frame_sample
    slot). Standard library only — ``struct`` chunk walk + numpy raster
    reshapes; the DIB payloads are stored bottom-up BGR with 4-byte row
    padding, undone here.

    Malformed bytes (bad fourcc, truncated chunk, frame-length mismatch)
    and honest capability limits (compressed '00dc' streams, non-24-bit
    DIBs — those need pyav/ffmpeg) raise ValueError — the DATA-error
    class `media_features(on_error="null")` quarantines."""
    import struct

    b = bytes(content)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI signature")
    (riff_size,) = struct.unpack("<I", b[4:8])
    if riff_size + 8 > len(b):
        raise ValueError("truncated AVI: RIFF size exceeds payload")

    state = {
        "width": None,
        "height": None,
        "bottom_up": True,
        "bit_count": None,
        "compression": None,
        "fps": None,
        "usec_per_frame": None,
        "await_vid_strf": False,
        "n_streams": 0,  # strh chunks appear in stream order
        "vid_stream": None,  # index of the FIRST 'vids' stream
    }
    frames_raw: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            start, stop = pos + 8, pos + 8 + size
            if stop > end:
                raise ValueError(f"truncated AVI chunk {fourcc!r}")
            if fourcc == b"LIST":
                list_type = b[start : start + 4]
                walk(start + 4, stop)  # skip the 4-byte list type
                if list_type == b"strl":
                    # strf acceptance is scoped to the elected strh's
                    # OWN strl: if a malformed file's 'vids' strh has no
                    # following strf, the flag must not survive into a
                    # later stream's strl, where e.g. a 40-byte audio
                    # WAVEFORMATEXTENSIBLE would be parsed as the video
                    # BITMAPINFOHEADER and yield garbage dimensions
                    state["await_vid_strf"] = False
            elif fourcc == b"avih" and size >= 4:
                (state["usec_per_frame"],) = struct.unpack("<I", b[start : start + 4])
            elif fourcc == b"strh" and size >= 32:
                # the ELECTED video stream is the FIRST 'vids' strh; its
                # strf (dims/compression) is the only one accepted — a
                # second video stream's strf must not overwrite the
                # elected stream's dimensions
                if b[start : start + 4] == b"vids" and state["vid_stream"] is None:
                    state["vid_stream"] = state["n_streams"]
                    state["await_vid_strf"] = True
                    scale, rate = struct.unpack("<II", b[start + 20 : start + 28])
                    if scale and rate:
                        state["fps"] = rate / scale
                state["n_streams"] += 1
            elif fourcc == b"strf" and state.get("await_vid_strf"):
                if size < 40:
                    raise ValueError("AVI video strf shorter than BITMAPINFOHEADER")
                _, bw, bh, _, bcnt, comp = struct.unpack(
                    "<IiiHHI", b[start : start + 20]
                )
                state["width"], state["height"] = bw, abs(bh)
                state["bottom_up"] = bh > 0  # negative biHeight = top-down
                state["bit_count"], state["compression"] = bcnt, comp
                state["await_vid_strf"] = False  # one strf per strh
            elif fourcc[:2].isdigit() and fourcc[2:4] in (b"db", b"dc"):
                # movi data chunk 'NNdb'/'NNdc' — only the ELECTED video
                # stream's chunks count; an audio or second-video
                # stream's chunks are ignored rather than concatenated
                # into the frame stack (or spuriously rejecting the file)
                if int(fourcc[:2]) != state["vid_stream"]:
                    pass
                elif fourcc[2:4] == b"db":  # uncompressed DIB frame
                    frames_raw.append(b[start:stop])
                else:  # '..dc' — compressed frame in the video stream
                    raise ValueError(
                        "compressed AVI frames ('..dc') need pyav/ffmpeg; this "
                        "stdlib path decodes uncompressed BI_RGB ('..db') only"
                    )
            pos = stop + (size & 1)  # RIFF chunks are word-aligned

    walk(12, min(len(b), riff_size + 8))
    if state["width"] is None or not frames_raw:
        raise ValueError("AVI missing video stream header or frames")
    if state["compression"] != 0 or state["bit_count"] != 24:
        raise ValueError(
            f"unsupported AVI DIB: biCompression={state['compression']} "
            f"biBitCount={state['bit_count']} (uncompressed 24-bit only; "
            "use pyav for compressed codecs)"
        )
    if state["width"] <= 0 or state["height"] <= 0:
        # zero-area rasters would flow to NaN features downstream and
        # dodge the on_error='null' quarantine (mean of empty slice)
        raise ValueError(
            f"AVI zero-area dimensions {state['width']}x{state['height']}"
        )
    w, h = state["width"], state["height"]
    stride = ((w * 3 + 3) // 4) * 4
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, fr in enumerate(frames_raw):
        if len(fr) != stride * h:
            raise ValueError(
                f"AVI frame {i} payload {len(fr)} B != stride*height {stride * h} B"
            )
        rows = np.frombuffer(fr, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        out[i] = img[::-1] if state["bottom_up"] else img
    fps = state["fps"]
    if fps is None and state["usec_per_frame"]:
        fps = 1e6 / state["usec_per_frame"]
    return out, float(fps or 0.0)


def avi_decode(content: bytes, meta) -> np.ndarray:
    """REAL codec decode for uncompressed RIFF/AVI video on the standard
    library alone — the video sibling of `wav_decode` / `png_decode`,
    through the exact same ``decode`` slot. Returns
    (n_frames, H*W*3) float64 in [0, 1): one row per frame, so
    `media_features`' row-mean profile becomes the video's TEMPORAL mean-
    intensity envelope resampled to `n_features` (the scene-change /
    black-frame signal a curation pipeline gates on). Compressed codecs
    (H.264 etc.) still need pyav/ffmpeg and stay honestly stubbed —
    `_avi_parse` raises ValueError on '..dc' chunks. `meta` is accepted
    for signature parity; the AVI headers are authoritative."""
    frames, _ = _avi_parse(content)
    return frames.reshape(frames.shape[0], -1).astype(np.float64) / 256.0


def avi_frames(content: bytes, meta) -> np.ndarray:
    """Frame-stack form of `avi_decode` for `frame_sample(frame_decode=)`:
    (n_frames, H*W, 3) float64 in [0, 1) — each sampled frame is a
    (pixels, channels) raster the per-frame feature reduces exactly like
    the stub route's array. Discards the container fps — rows sampled
    through this form get ts_ms from ``meta.duration_ms`` only (ts_ms=0
    when duration is NULL); use `avi_frames_timed` to keep container
    timing as the fallback."""
    frames, _ = _avi_parse(content)
    n, h, w, c = frames.shape
    return frames.reshape(n, h * w, c).astype(np.float64) / 256.0


def avi_frames_timed(content: bytes, meta) -> tuple:
    """`avi_frames` plus container timing: returns (stack, fps) — the
    two-tuple form of the `frame_sample(frame_decode=)` contract. When
    ``meta.duration_ms`` is NULL, `frame_sample` falls back to the
    container's fps (from the strh rate/scale or avih usec-per-frame)
    for ts_ms instead of silently stamping every frame 0."""
    frames, fps = _avi_parse(content)
    n, h, w, c = frames.shape
    return frames.reshape(n, h * w, c).astype(np.float64) / 256.0, fps


def avi_bytes(rasters: np.ndarray, *, fps: int = 10) -> bytes:
    """Serialize a (n_frames, H, W, 3) uint8 RGB raster stack into a
    minimal REAL uncompressed 24-bit RIFF/AVI (bottom-up BGR DIB frames
    with 4-byte row padding, correct chunk sizes) — the single writer
    behind `synthetic_avi` AND the raster-pin tests, so the fixture and
    the orientation/channel-order pins can't drift apart."""
    import struct

    n_video_frames, height, width, _ = rasters.shape
    stride = ((width * 3 + 3) // 4) * 4

    def _chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def _list(list_type: bytes, payload: bytes) -> bytes:
        return _chunk(b"LIST", list_type + payload)

    frame_chunks = []
    for fr in rasters:
        dib = np.zeros((height, stride), dtype=np.uint8)
        dib[:, : width * 3] = fr[::-1, :, ::-1].reshape(height, width * 3)
        frame_chunks.append(_chunk(b"00db", dib.tobytes()))
    avih = struct.pack(
        "<14I",
        int(1e6 / fps), 0, 0, 0,
        n_video_frames, 0, 1, stride * height,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IIIIIIIIII", 0, 0, 0, 1, fps, 0, n_video_frames,
            stride * height, 0, 0,
        ) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, stride * height, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(frame_chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthetic_avi(
    spark: SparkSession,
    n: int = 8,
    *,
    seed: int = 0,
    width: int = 24,
    height: int = 16,
    n_video_frames: int = 12,
    fps: int = 10,
) -> DataFrame:
    """Deterministic corpus of REAL uncompressed 24-bit RIFF/AVI files
    (seeded random rasters through `avi_bytes`) in the `MEDIA_SCHEMA`
    shape — the video twin of `synthetic_wav` / `synthetic_png`:
    content a real parser accepts, exercised through the same Arrow
    path as the stubs."""
    duration_ms = int(round(n_video_frames * 1000.0 / fps))
    rows = []
    for i in range(n):
        rng = np.random.default_rng((seed, i))
        rasters = rng.integers(
            0, 256, size=(n_video_frames, height, width, 3), dtype=np.uint8
        )
        rows.append(
            (
                f"video-{i}",
                "video",
                bytearray(avi_bytes(rasters, fps=fps)),
                ("video/x-msvideo", width, height, duration_ms, None),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def media_features(
    media: DataFrame,
    *,
    decode: Callable[[bytes, dict], np.ndarray] | None = fake_decode,
    n_features: int = 8,
    batch_size_hint: int = 256,
    hex_hash: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Decode + feature-extract: (media_id, feature array<double>,
    n_bytes, content_hash). One Arrow batch at a time; feature = row-mean
    profile of the decoded array resampled to `n_features` (stand-in for
    an embedding model forward pass).

    `decode=None` marks the real-codec path: raises NotImplementedError
    naming the integration point rather than silently faking.
    `hex_hash=True` hashes the UPPERCASE hex of the bytes instead of the
    raw bytes — same dedup/identity semantics (hex is injective), but
    expressible in engines whose md5 only accepts VARCHAR (DuckDB), the
    `media_exact_dedup` convention.

    `on_error`: with a REAL decoder (`wav_decode`, a production codec),
    one malformed payload would otherwise raise inside the Arrow kernel
    and abort the whole job after task retries — the wrong trade for a
    crawl-scale corpus where bad bytes are routine. ``"null"`` isolates
    per record: the row survives with feature=NULL (hash and size still
    computed from the bytes, so dedup identity is unaffected) and the
    caller quarantines `feature IS NULL` rows downstream — run
    `media_quarantine_report` on the output for the count/rate (one
    small agg) and alert on it: a systematically broken corpus shows up
    as a spike, not silence.
    Decoder PROGRAMMING errors (TypeError/NameError/AttributeError —
    wrong signature, typo'd attribute) always propagate, even under
    ``"null"``: a broken decoder would otherwise quarantine 100% of the
    corpus indistinguishably from bad bytes. ``"raise"`` (default)
    keeps strict fail-fast — right for trusted fixtures and the
    oracle-checked stub path."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be raise|null, got {on_error!r}")
    if decode is None:
        raise NotImplementedError(
            "decode=None names the plug-in point for a full codec library "
            "(Pillow/soundfile/pyav), not present in this environment; pass "
            "the stdlib decoders wav_decode (PCM WAV) / png_decode (8-bit "
            "PNG) / avi_decode (uncompressed AVI), decode=fake_decode, or "
            "your own Callable[[bytes, meta], np.ndarray]"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("modality", T.StringType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("content_hash", T.StringType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def f(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            feats, hashes, sizes = [], [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                b = bytes(content)
                # hash/size come from the BYTES, never the decode — one
                # computation for every branch below, so dedup identity
                # can't diverge between good, empty, and bad payloads
                hashes.append(
                    hashlib.md5(b.hex().upper().encode()).hexdigest()
                    if hex_hash
                    else hashlib.md5(b).hexdigest()
                )
                sizes.append(len(b))
                try:
                    arr = decode(b, meta)
                except (TypeError, NameError, AttributeError):
                    # programming errors in the decoder itself (wrong
                    # signature, typo'd attribute) must SURFACE even
                    # under on_error="null" — quarantining them would
                    # silently null every feature in the corpus and look
                    # identical to routinely-bad bytes
                    raise
                except Exception:
                    if on_error == "raise":
                        raise
                    feats.append(None)  # quarantine mark — see docstring
                    continue
                prof = arr.mean(axis=1)
                if len(prof) == 0:
                    # a VALID zero-length payload (e.g. a WAV with an
                    # empty data chunk through wav_decode) — a defined
                    # all-zero feature instead of an IndexError from
                    # resampling an empty profile killing the task
                    feats.append([0.0] * n_features)
                    continue
                # resample the profile to fixed length (cheap "pooling")
                idx = np.linspace(0, len(prof) - 1, n_features).round().astype(int)
                feats.append([float(x) for x in prof[idx]])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": np.asarray(sizes, dtype="int32"),
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(f, schema=out_schema)


def media_quarantine_report(features: DataFrame) -> dict:
    """Aggregate `media_features(on_error="null")` output into the run
    report a media-ingest job logs — the `curation_report` sibling for
    the quarantine channel, so a systematically broken decoder is one
    artifact read away instead of a downstream `feature IS NULL` count
    someone has to remember to run. One small groupBy over the (narrow)
    feature frame: overall total / quarantined / rate plus the same
    split per modality (a broken IMAGE decoder shows as a modality-local
    spike, not a diluted corpus-wide rate)."""
    rows = (
        features.groupBy("modality")
        .agg(
            F.count("*").alias("total"),
            F.count(F.when(F.col("feature").isNull(), 1)).alias("quarantined"),
        )
        .collect()
    )
    total = sum(r["total"] for r in rows)
    quarantined = sum(r["quarantined"] for r in rows)
    return {
        "total": total,
        "quarantined": quarantined,
        "rate": (quarantined / total) if total else 0.0,
        "by_modality": {
            # NULL modality (quarantine-grade metadata from an untyped
            # ingest) sorts last instead of TypeError-ing the report
            r["modality"]: {"total": r["total"], "quarantined": r["quarantined"]}
            for r in sorted(rows, key=lambda r: (r["modality"] is None, r["modality"] or ""))
        },
    }


def media_exact_dedup(media: DataFrame, *, hex_hash: bool = False) -> DataFrame:
    """Byte-exact dedup over the binary column — pure JVM (md5 on
    binary), no Python: (media_id, content_hash, canonical_id, is_dup).

    `hex_hash=True` hashes the hex encoding of the bytes instead of the
    raw bytes (`md5(hex(content))`) — identical dedup semantics (hex is
    injective), but expressible in engines whose md5 only accepts
    VARCHAR (DuckDB) so the driver contract can oracle-check it."""
    h = F.md5(F.upper(F.hex(F.col("content")))) if hex_hash else F.md5(F.col("content"))
    w = F.min("media_id").over(Window.partitionBy("content_hash"))
    return (
        media.withColumn("content_hash", h)
        .withColumn("canonical_id", w)
        .withColumn("is_dup", F.col("media_id") != F.col("canonical_id"))
        .select("media_id", "content_hash", "canonical_id", "is_dup")
    )


def frame_sample(
    media: DataFrame,
    *,
    n_frames: int = 4,
    decode: Callable[[bytes, dict], np.ndarray] | None = fake_decode,
    frame_decode: Callable[[bytes, dict], np.ndarray] | None = None,
) -> DataFrame:
    """Video → sampled frames, one output row per frame (flatMap shape):
    (media_id, frame_idx, ts_ms, frame_feature).

    Two routes through the same Arrow kernel:

    - **Real codec** (``frame_decode=avi_frames`` or a pyav kernel with
      the same signature): the callable returns the decoded
      (total_frames, pixels, channels) stack — or a ``(stack, fps)``
      two-tuple (``avi_frames_timed``) to carry container timing;
      `n_frames` positions are sampled at linspace over the ACTUAL
      frame count, ts_ms is the sampled frame's timestamp from
      ``meta.duration_ms`` spread over the stack (falling back to the
      decoder-reported fps when duration_ms is NULL, else ts_ms=0 —
      the documented null-duration degradation for stack-only
      decoders), and the per-frame feature is the WHOLE-frame
      per-channel mean (``frame.mean(axis=0)``, length = channels) —
      a content-bearing reduction over every pixel, not a corner
      sample, so black-frame/scene-change gating sees the full image.
      Decoder errors propagate (sample a quarantined corpus with
      `media_features(on_error="null")` first if bytes are untrusted).
    - **Stub** (default, oracle-expressible): deterministic positions
      linspace over ``meta.duration_ms``; the per-frame "decode" reuses
      the media decode stub with the frame index mixed in via np.roll.
      ``decode=None`` marks the unavailable-codec path for COMPRESSED
      video (H.264 etc. need pyav/ffmpeg — uncompressed RIFF/AVI has the
      real stdlib route above)."""
    if frame_decode is None and decode is None:
        raise NotImplementedError(
            "real frame extraction for compressed video needs pyav/ffmpeg; "
            "uncompressed RIFF/AVI decodes with frame_decode=avi_frames "
            "(stdlib), or pass decode=fake_decode for the stub route"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.IntegerType()),
            T.StructField("frame_feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def g(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                duration = int(meta["duration_ms"] or 0)
                if frame_decode is not None:
                    decoded = frame_decode(bytes(content), meta)
                    # contract: a bare stack, or (stack, fps) from a
                    # timed decoder (avi_frames_timed) — fps is the
                    # ts_ms fallback when duration_ms is NULL
                    if isinstance(decoded, tuple):
                        stack, fps = decoded
                    else:
                        stack, fps = decoded, None
                    total = stack.shape[0]
                    if total == 0:
                        # a custom decoder may return an empty stack for
                        # a frameless container — no rows, not an
                        # IndexError (avi_frames itself raises upstream)
                        continue
                    positions = (
                        np.linspace(0, total - 1, n_frames).round().astype(int)
                    )
                    for j, fidx in enumerate(positions):
                        frame = stack[fidx]
                        if duration > 0:
                            ts = int(round(fidx * duration / total))
                        elif fps:
                            ts = int(round(fidx * 1000.0 / fps))
                        else:
                            ts = 0  # documented stack-only degradation
                        rows.append(
                            (mid, j, ts, [float(x) for x in frame.mean(axis=0)])
                        )
                    continue
                positions = np.linspace(0, max(duration - 1, 0), n_frames).astype(int)
                base = decode(bytes(content), meta)
                for j, ts in enumerate(positions):
                    frame = np.roll(base, j, axis=0)
                    rows.append(
                        (mid, j, int(ts), [float(x) for x in frame.mean(axis=1)[:4]])
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame_feature"])

    return media.mapInPandas(g, schema=out_schema)
