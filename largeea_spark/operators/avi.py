"""Stdlib-only Motion-JPEG AVI container codec.

Makes the VIDEO modality real in-sandbox: `encode_mjpeg_avi` writes a
well-formed RIFF AVI (avih + strl('vids'/'MJPG') headers, 'movi' list
of `00dc` frames, idx1 index) whose frames are baseline JPEGs from
`jpeg.py`; `decode_avi_frames` parses the RIFF chunk tree back into
(jpeg_bytes_per_frame, fps). Frame pixels therefore round-trip through
the real entropy-coded JPEG path, so `multimodal.sample_frames` can
decode ACTUAL video frames at sampled timestamps. Non-MJPEG codecs
(H.264 etc.) keep the documented NotImplementedError seam for
PyAV/ffmpeg on a real cluster.

The reference (LargeEA) has no video path; this serves the
training-data-pipeline multimodal instruction. Container layout per
the public MS RIFF/AVI spec.
"""

from __future__ import annotations

import numpy as np

_SEAM_MSG = (
    "only Motion-JPEG ('MJPG') AVI decodes in-sandbox; swap in "
    "PyAV/ffmpeg here on a real cluster for {what}"
)


def _chunk(cid: bytes, payload: bytes) -> bytes:
    return cid + len(payload).to_bytes(4, "little") + payload + (
        b"\0" if len(payload) & 1 else b""
    )


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """List of (H, W, 3) uint8 RGB frames (uniform dims) → MJPEG AVI
    bytes. Deterministic (JPEG encoder is); fixture-side counterpart of
    `decode_avi_frames`."""
    from .jpeg import encode_jpeg_baseline

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share dimensions")
    jpegs = [encode_jpeg_baseline(f, quality, subsample="420") for f in frames]

    us_per_frame = round(1_000_000 / fps)
    max_bytes = max(len(j) for j in jpegs)
    avih = b"".join(v.to_bytes(4, "little") for v in (
        us_per_frame, max_bytes * fps, 0, 0x10,  # dwFlags: HASINDEX
        len(jpegs), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    ))
    strh = (
        b"vids" + b"MJPG" + (0).to_bytes(4, "little") * 3
        + (1).to_bytes(4, "little")            # dwScale
        + fps.to_bytes(4, "little")            # dwRate → fps = rate/scale
        + (0).to_bytes(4, "little")
        + len(jpegs).to_bytes(4, "little")
        + max_bytes.to_bytes(4, "little")
        + (0xFFFFFFFF).to_bytes(4, "little")   # quality: default
        + (0).to_bytes(4, "little")
        + (0).to_bytes(2, "little") * 2 + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
    )
    strf = (  # BITMAPINFOHEADER with biCompression='MJPG'
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"MJPG" + (w * h * 3).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_frames = [_chunk(b"00dc", j) for j in jpegs]
    movi = _list(b"movi", b"".join(movi_frames))

    idx, off = [], 4  # offsets relative to the start of 'movi' fourcc
    for fr, j in zip(movi_frames, jpegs):
        idx.append(b"00dc" + (0x10).to_bytes(4, "little")  # AVIIF_KEYFRAME
                   + off.to_bytes(4, "little") + len(j).to_bytes(4, "little"))
        off += len(fr)
    idx1 = _chunk(b"idx1", b"".join(idx))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(b: bytes, i: int, end: int):
    """Yield (fourcc, list_kind_or_None, payload_start, payload_size)
    over a RIFF chunk range."""
    while i + 8 <= end:
        cid = b[i : i + 4]
        sz = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"LIST":
            yield cid, b[i + 8 : i + 12], i + 12, sz - 4
        else:
            yield cid, None, i + 8, sz
        i += 8 + sz + (sz & 1)


def decode_avi_frames(content: bytes) -> tuple[list[bytes], float]:
    """AVI bytes → (list of per-frame JPEG bytes, fps).

    Walks the RIFF tree: fps from strh dwRate/dwScale (falling back to
    avih dwMicroSecPerFrame), frames from `..dc`/`..db` chunks inside
    LIST 'movi' (recursing through 'rec ' groups). Raises
    NotImplementedError for non-AVI bytes or non-MJPG streams."""
    b = bytes(content)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(_SEAM_MSG.format(what="non-AVI video"))
    fps, codec, frames = None, None, []

    def collect_movi(start, size):
        for cid, kind, ps, sz in _walk(b, start, start + size):
            if kind == b"rec ":
                collect_movi(ps, sz)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(b[ps : ps + sz])

    for cid, kind, ps, sz in _walk(b, 12, len(b)):
        if kind == b"hdrl":
            for c2, k2, p2, s2 in _walk(b, ps, ps + sz):
                if c2 == b"avih" and s2 >= 4 and fps is None:
                    us = int.from_bytes(b[p2 : p2 + 4], "little")
                    fps = 1_000_000 / us if us else None
                if k2 == b"strl":
                    for c3, _, p3, s3 in _walk(b, p2, p2 + s2):
                        if c3 == b"strh" and s3 >= 28:
                            if b[p3 : p3 + 4] == b"vids":
                                codec = b[p3 + 4 : p3 + 8]
                                scale = int.from_bytes(b[p3 + 20 : p3 + 24], "little")
                                rate = int.from_bytes(b[p3 + 24 : p3 + 28], "little")
                                if scale and rate:
                                    fps = rate / scale
        elif kind == b"movi":
            collect_movi(ps, sz)

    if codec is not None and codec not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            _SEAM_MSG.format(what=f"codec {codec!r}")
        )
    if not frames or not fps:
        raise ValueError("malformed AVI: no frames or no timing header")
    return frames, float(fps)


def decode_frame_at(content: bytes, ts_ms: int) -> np.ndarray:
    """AVI bytes + timestamp → decoded (H, W, 3) uint8 RGB frame
    nearest to ``ts_ms`` (clamped to the stream length)."""
    from .jpeg import decode_jpeg_baseline

    frames, fps = decode_avi_frames(content)
    i = min(int(round(ts_ms / 1000.0 * fps)), len(frames) - 1)
    return decode_jpeg_baseline(frames[max(i, 0)])
