"""Stdlib-only WAV PCM codec + deterministic numpy audio features.

Makes the AUDIO modality real in-sandbox the same way `jpeg.py`/the
PNG/BMP/PPM codecs did for images: `decode_wav` parses RIFF/WAVE PCM
(8/16-bit, any channel count) into float samples, `audio_features`
computes framed spectral statistics with numpy's rFFT, and
`encode_wav` is the fixture-side counterpart so tests synthesize REAL
audio bytes deterministically. Non-PCM encodings (float32 WAV, ADPCM,
MP3/OGG/FLAC, ...) keep the documented NotImplementedError seam for
librosa/soundfile on a real cluster.

Reference parity note: the reference pipeline (LargeEA) has no audio
path; this module exists for the training-data-pipeline instruction
(multimodal binary columns with typed metadata) — the Spark-side
plumbing lives in `multimodal.py` and treats these as per-row kernels
inside iterator `mapInPandas`, so blobs never leave the executor.
"""

from __future__ import annotations

import numpy as np

_SEAM_MSG = (
    "only RIFF/WAVE integer PCM (8/16-bit) decodes in-sandbox; swap in "
    "soundfile/librosa here on a real cluster for {what}"
)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, ch)) → 16-bit PCM WAV
    bytes. Deterministic; the fixture-side counterpart of `decode_wav`."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block_align = ch * 2
    fmt = (
        (1).to_bytes(2, "little")                 # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")              # bits/sample
    )
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 samples in [-1, 1], sample_rate).

    Parses the RIFF chunk stream directly (stdlib/numpy only): accepts
    integer PCM at 8 bits (unsigned) or 16 bits (signed LE), any
    channel count (downmixed to mono by mean), tolerates extra chunks
    (LIST/fact/cue) and odd-size chunk padding. Raises
    NotImplementedError for non-PCM formats (the librosa seam) and
    ValueError for malformed containers.
    """
    b = bytes(content)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(_SEAM_MSG.format(what="non-WAV audio"))
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        sz = int.from_bytes(b[i + 4 : i + 8], "little")
        payload = b[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data":
            data = payload
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 0xFFFE and len(fmt) >= 26:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = int.from_bytes(fmt[24:26], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            _SEAM_MSG.format(what=f"format={audio_format} bits={bits}")
        )
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("malformed WAV: zero channels or sample rate")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        x = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, dtype=np.uint8)
        x = (raw.astype(np.float64) - 128.0) / 128.0
    n = len(x) // n_channels
    return x[: n * n_channels].reshape(n, n_channels).mean(axis=1), sample_rate


def audio_features(samples: np.ndarray, sample_rate: int,
                   dim: int = 32, frame: int = 512, hop: int = 256
                   ) -> np.ndarray:
    """Deterministic spectral feature vector (the audio counterpart of
    `multimodal.image_features`): Hann-windowed framed rFFT → mean
    power spectrum → `dim - 4` log band energies on a linear frequency
    grid, plus RMS, zero-crossing rate, spectral centroid (normalized
    to Nyquist) and log duration; L2-normalized float32 of length
    ``dim``. Pure numpy — same shape/dtype contract as an embedding
    model, so downstream kNN/dedup operators consume it unchanged."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    if x.size < frame:
        x = np.pad(x, (0, frame - x.size))
    n_frames = 1 + (x.size - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    pspec = spec.mean(axis=0)  # mean power per rFFT bin

    n_bands = max(dim - 4, 1)
    edges = np.linspace(0, len(pspec), n_bands + 1).astype(int)
    bands = np.array([
        pspec[a:bnd].sum() if bnd > a else 0.0
        for a, bnd in zip(edges[:-1], edges[1:])
    ])
    log_bands = np.log1p(bands)

    rms = float(np.sqrt(np.mean(x ** 2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
    freqs = np.arange(len(pspec)) * (sample_rate / 2.0) / max(len(pspec) - 1, 1)
    centroid = float((freqs * pspec).sum() / max(pspec.sum(), 1e-12))
    centroid_norm = centroid / max(sample_rate / 2.0, 1e-12)
    log_dur = float(np.log1p(x.size / sample_rate))

    v = np.concatenate([[rms, zcr, centroid_norm, log_dur], log_bands])[:dim]
    v = np.pad(v, (0, dim - len(v)))
    return (v / max(np.linalg.norm(v), 1e-12)).astype(np.float32)


def spectral_centroid_hz(samples: np.ndarray, sample_rate: int,
                         frame: int = 512, hop: int = 256) -> float:
    """Mean-power spectral centroid in Hz (exposed for tests: a pure
    tone at f Hz must centroid near f)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size < frame:
        x = np.pad(x, (0, frame - x.size))
    n_frames = 1 + (x.size - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * np.hanning(frame), axis=1)) ** 2
    pspec = spec.mean(axis=0)
    freqs = np.arange(len(pspec)) * (sample_rate / 2.0) / max(len(pspec) - 1, 1)
    return float((freqs * pspec).sum() / max(pspec.sum(), 1e-12))
