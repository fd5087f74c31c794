"""Baseline JPEG codec in pure numpy + stdlib (SURVEY.md multimodal).

Closes the media-codec seam for the format a web corpus actually
contains most of: sequential baseline JFIF (ITU-T.81). The reference
pipeline has no image path at all — this exists for the engine's
multimodal columns (`multimodal.py`), where image bytes are opaque
``binary`` cells and decode runs inside ``mapInPandas`` batches.

Decoder: full marker parse (DQT/DHT/SOF0/DRI/SOS), Huffman tables built
from the FILE's own DHT segments (no table assumptions), 8-bit quant
tables, 4:4:4 and 4:2:0 sampling, restart markers. Progressive (SOF2),
arithmetic coding, 12-bit precision and 16-bit quant tables raise
``NotImplementedError`` — the documented PIL seam, same contract as the
PNG/PPM/BMP codecs.

Encoder: exists so tests/fixtures can synthesize REAL JPEG bytes
deterministically in-sandbox — Annex-K quantization tables scaled by
the classic IJG quality curve, 4:4:4, and a flat canonical Huffman pair
(all 12 DC categories at 4 bits, all 162 AC run/size symbols at 8
bits — a valid if mildly suboptimal table; the decoder never assumes
it). Round-trip error is then pure quantization error, asserted in
tests as PSNR.

Everything here is closed-form numpy on tiny 8x8 blocks; the Spark
side (schema, batching, partitioning) lives in multimodal.py.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# shared math
# ---------------------------------------------------------------------------


def _dct_mat() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix T: dct(B) = T @ B @ T.T."""
    k = np.arange(8)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    t[0] *= np.sqrt(1 / 2)
    return t * 0.5


_T = _dct_mat()


def _zigzag() -> np.ndarray:
    """Zigzag scan order as 64 flat indices into a row-major 8x8 block."""
    order = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[1] if (p[0] + p[1]) % 2 else p[0]),
    )
    return np.array([i * 8 + j for i, j in order])


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)

# Annex-K example quantization tables (ITU-T.81 Tables K.1/K.2)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tl = np.clip((_QL * scale + 50) // 100, 1, 255)
    tc = np.clip((_QC * scale + 50) // 100, 1, 255)
    return tl.astype(np.int32), tc.astype(np.int32)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    ], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136286 * cb - 0.714136286 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _mag_category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

# flat canonical Huffman pair: valid per the DHT grammar, shared by all
# components; decoder reconstructs from the emitted BITS/HUFFVAL
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = sorted([0x00, 0xF0] + [(r << 4) | s for r in range(16)
                                  for s in range(1, 11)])
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical DHT reconstruction."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _encode_block(w: _BitWriter, q: np.ndarray, block: np.ndarray, pred: int) -> int:
    coeff = np.round((_T @ (block - 128.0) @ _T.T) / q.reshape(8, 8))
    zz = coeff.astype(np.int64).ravel()[_ZZ]
    dc = int(zz[0])
    diff = dc - pred
    s = _mag_category(diff)
    w.put(*_DC_ENC[s])
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = (nz[-1] + 1) if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.put(*_AC_ENC[0xF0])
            run -= 16
        s = _mag_category(v)
        w.put(*_AC_ENC[(run << 4) | s])
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        w.put(*_AC_ENC[0x00])  # EOB
    return dc


def encode_jpeg_baseline(img: np.ndarray, quality: int = 90,
                         subsample: str = "444",
                         restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → sequential baseline JFIF bytes.

    ``subsample``: "444" (one Y/Cb/Cr block per MCU) or "420" (2x2 Y
    blocks + box-averaged half-res chroma — what web JPEGs actually
    use, so the decoder's sampling-factor path has a real exerciser).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (predictors reset, writer byte-aligned).

    Deterministic (pure integer/fixed-float math, no RNG): the fixture
    generator for the decoder's tests and for multimodal synth tables.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    tl, tc = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(img)
    mcu = 8 if subsample == "444" else 16
    ph = (h + mcu - 1) // mcu * mcu
    pw = (w + mcu - 1) // mcu * mcu
    padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y_plane = padded[..., 0]
    if subsample == "420":
        cb = padded[..., 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = padded[..., 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        samp_y = 0x22
    else:
        cb, cr = padded[..., 1], padded[..., 2]
        samp_y = 0x11

    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(tl.ravel()[_ZZ].astype(np.uint8)))
    out += _seg(0xDB, bytes([0x01]) + bytes(tc.ravel()[_ZZ].astype(np.uint8)))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += _seg(0xC0, sof)                              # SOF0 baseline
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcu = 0
    rst = 0
    for by in range(0, ph, mcu):
        for bx in range(0, pw, mcu):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            n_mcu += 1
            if subsample == "420":
                for v in range(2):
                    for u in range(2):
                        preds[0] = _encode_block(
                            bw, tl,
                            y_plane[by + v * 8:by + v * 8 + 8,
                                    bx + u * 8:bx + u * 8 + 8],
                            preds[0],
                        )
                cy, cx = by // 2, bx // 2
                preds[1] = _encode_block(
                    bw, tc, cb[cy:cy + 8, cx:cx + 8], preds[1])
                preds[2] = _encode_block(
                    bw, tc, cr[cy:cy + 8, cx:cx + 8], preds[2])
            else:
                for c, (plane, q) in enumerate(
                    [(y_plane, tl), (cb, tc), (cr, tc)]
                ):
                    preds[c] = _encode_block(
                        bw, q, plane[by:by + 8, bx:bx + 8], preds[c]
                    )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:   # RSTn inside _fill = overread
                raise ValueError("bit read across a restart marker")
            else:
                raise ValueError("bit read into a marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_eat_rst(self) -> None:
        self.acc, self.n = 0, 0
        # an all-ones pad byte becomes a stuffed FF00 — skip it
        while self.d[self.pos] == 0xFF and self.d[self.pos + 1] == 0x00:
            self.pos += 2
        if self.d[self.pos] == 0xFF and 0xD0 <= self.d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Sequential baseline JFIF bytes → (H, W, 3) uint8 RGB (or (H, W)
    replicated to 3 channels for grayscale). Huffman + quant tables are
    read from the file itself. Progressive / arithmetic / 12-bit raise
    NotImplementedError (the PIL seam)."""
    b = bytes(data)
    if b[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    dri = 0
    pos = 2
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        m = b[pos + 1]
        if m == 0xD9:
            raise ValueError("EOI before SOS")
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(b[pos + 2:pos + 4], "big")
        seg = b[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if m == 0xDB:                                   # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (PIL seam)")
                tbl = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                qt[tq] = tbl.astype(np.int32)[_UNZZ].reshape(8, 8)
                i += 65
        elif m == 0xC4:                                 # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                enc = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(ln_, code): sym
                                  for sym, (code, ln_) in enc.items()}
                i += 17 + nv
        elif m == 0xC0 or m == 0xC1:                    # SOF0/1 baseline
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision (PIL seam)")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = [
                {"id": seg[6 + 3 * i], "hs": seg[7 + 3 * i] >> 4,
                 "vs": seg[7 + 3 * i] & 0xF, "tq": seg[8 + 3 * i]}
                for i in range(nc)
            ]
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{m:02X} (progressive/"
                "arithmetic — PIL seam)"
            )
        elif m == 0xDD:                                 # DRI
            dri = int.from_bytes(seg[:2], "big")
        elif m == 0xDA:                                 # SOS → scan follows
            ns = seg[0]
            scan = {seg[1 + 2 * i]: (seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                    for i in range(ns)}
            break
    else:
        raise ValueError("no SOS segment")
    if not comps:
        raise ValueError("no SOF before SOS")

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    for c in comps:
        if (hmax // c["hs"]) * c["hs"] != hmax or (vmax // c["vs"]) * c["vs"] != vmax:
            raise NotImplementedError("non-integer sampling ratio (PIL seam)")
    mw, mh = 8 * hmax, 8 * vmax
    mcux = (w + mw - 1) // mw
    mcuy = (h + mh - 1) // mh
    planes = [
        np.zeros((mcuy * 8 * c["vs"], mcux * 8 * c["hs"]), dtype=np.float64)
        for c in comps
    ]

    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                br.align_and_eat_rst()
                preds = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                q = qt[c["tq"]]
                for v in range(c["vs"]):
                    for u in range(c["hs"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _decode_huff(br, huff[(0, dc_t)])
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(br, huff[(1, ac_t)])
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0xF
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        block = (zz * q.ravel()[_ZZ])[_UNZZ].reshape(8, 8)
                        pix = _T.T @ block.astype(np.float64) @ _T + 128.0
                        y0 = (my * c["vs"] + v) * 8
                        x0 = (mx * c["hs"] + u) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["vs"], axis=0),
                      hmax // c["hs"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component scan (PIL seam)")
    return _ycbcr_to_rgb(full[0], full[1], full[2])
