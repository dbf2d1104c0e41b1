"""Real baseline JPEG (ITU-T T.81) codec in pure numpy — no libjpeg.

This closes the round-1 gap "real camera JPEG decode raises
NotImplementedError" (``imagecodec.py``): ``decode_jpeg`` parses an actual
JFIF/T.81 baseline-sequential bitstream (SOF0, DQT, DHT, DRI/RSTn, 4:4:4 /
4:2:2 / 4:2:0 chroma sampling) and ``encode_jpeg`` emits one, using the
public Annex K quantization + Huffman tables and the IJG quality-scaling
formula. Everything here derives from the published T.81 spec and the JFIF
1.02 note — no third-party code.

Reference parity: the reference delegates image bytes to the browser /
undici as opaque downloads (``src/shared/download-utils.ts``); this module
is the engine-side decode seam the north rule's "per-row decoded-pixel
PSNR >= 40 dB for lossy formats" invariant is proven against — now against
a real JPEG bitstream, not only the deterministic stand-in codec.

Scale note: DCT/IDCT, quantization, level-shift and color transforms are
vectorized over all 8x8 blocks at once (einsum); only the entropy coder is
a per-block Python loop, which is the correct trade for the fixture-scale
images this sandbox decodes (the crawl hot path keeps the deterministic
stand-in codec so benches stay comparable across rounds).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables (ITU-T T.81 Annex K — public spec)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order).
QTAB_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QTAB_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS counts for code lengths 1..16, values).
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
    0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
    0xF9, 0xFA,
]

# Orthonormal 8x8 DCT-II matrix: forward = D @ B @ D.T, inverse = D.T @ C @ D.
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 Annex C canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """16-bit-prefix lookup: lut[peek16] = (symbol << 8) | code_length."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            lut[lo:hi] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    return lut


_ENC_DC_LUM = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
_ENC_DC_CHROM = _canonical_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
_ENC_AC_LUM = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
_ENC_AC_CHROM = _canonical_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)


def quality_scale(qtab: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg formula): 1..100 -> scaled table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qtab * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 48 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def peek16(self) -> int:
        self._fill()
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        # past end: pad with 1s (matches encoder's flush padding)
        short = 16 - self.nbits
        return ((self.acc << short) | ((1 << short) - 1)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            raise ValueError("truncated JPEG entropy stream")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v


# ---------------------------------------------------------------------------
# Shared block math (vectorized over all blocks)
# ---------------------------------------------------------------------------


def _plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) float plane (multiple-of-8 dims) -> (nby, nbx, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _blocks_to_plane(blocks: np.ndarray) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    return blocks.swapaxes(1, 2).reshape(nby * 8, nbx * 8)


def _fdct_quant(plane: np.ndarray, qtab64: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization for a whole component plane.

    Returns (nby, nbx, 64) int32 coefficients in ZIGZAG order.
    """
    blocks = _plane_to_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    q = np.round(coef.reshape(*coef.shape[:2], 64) / qtab64.astype(np.float64))
    return q.astype(np.int32)[..., ZIGZAG]


def _dequant_idct(zz: np.ndarray, qtab64: np.ndarray) -> np.ndarray:
    """(nby, nbx, 64) zigzag coefficients -> spatial plane (uint8-range float)."""
    coef = (zz.astype(np.float64) * qtab64)[..., _UNZIGZAG]
    blocks = coef.reshape(*coef.shape[:2], 8, 8)
    spatial = np.einsum("ji,abjk,kl->abil", _DCT, blocks, _DCT) + 128.0
    return _blocks_to_plane(spatial)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = h - plane.shape[0], w - plane.shape[1]
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred_dc: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    diff = dc - pred_dc
    size = int(abs(diff)).bit_length()
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(_mag_bits(diff, size), size)

    nz = np.nonzero(zz[1:])[0]
    if len(nz) == 0:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
        return dc
    last = int(nz[-1]) + 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(_mag_bits(v, size), size)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]
        bw.write(code, length)
    return dc


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale uint8 as baseline JFIF JPEG.

    ``subsample=True`` emits 4:2:0 chroma (2x2 mean downsample); default is
    4:4:4 which keeps chroma full-resolution (higher fidelity, bigger file).
    ``restart_interval=N`` emits a DRI segment and an RSTn marker every N
    MCUs (T.81 F.1.2.6) — resumable entropy segments, as camera JPEGs use.
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    qlum = quality_scale(QTAB_LUM, quality)
    qchrom = quality_scale(QTAB_CHROM, quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 mean chroma downsample on an edge-padded even grid
            cbp = _pad_to(cb, (h + 1) // 2 * 2, (w + 1) // 2 * 2)
            crp = _pad_to(cr, (h + 1) // 2 * 2, (w + 1) // 2 * 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # Quantized zigzag coefficients per component, padded to MCU coverage.
    comp_zz = []
    for plane, (sh, sv), qi in zip(planes, samp, qsel):
        plane = _pad_to(plane, mcus_y * sv * 8, mcus_x * sh * 8)
        comp_zz.append(_fdct_quant(plane, qlum if qi == 0 else qchrom))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for qi, qt in ((0, qlum), (1, qchrom)) if not gray else ((0, qlum),):
        # DQT payload is zigzag-ordered per T.81 B.2.4.1
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([qi]) + bytes(
            int(qt[int(ZIGZAG[z])]) for z in range(64)
        )
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += _dht_segment(0x00, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(0x10, _AC_LUM_BITS, _AC_LUM_VALS)
    if not gray:
        out += _dht_segment(0x01, _DC_CHROM_BITS, _DC_CHROM_VALS)
        out += _dht_segment(0x11, _AC_CHROM_BITS, _AC_CHROM_VALS)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        tabs = 0x00 if qsel[ci] == 0 else 0x11
        out += bytes([ci + 1, tabs])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    bw = _BitWriter()
    preds = [0] * ncomp
    enc_tabs = [
        (_ENC_DC_LUM, _ENC_AC_LUM) if qi == 0 else (_ENC_DC_CHROM, _ENC_AC_CHROM)
        for qi in qsel
    ]
    mcu_n = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()
                out += bw.buf
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samp[ci]
                dc_tab, ac_tab = enc_tabs[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(bw, zz, preds[ci], dc_tab, ac_tab)
            mcu_n += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential T.81 JPEG -> (H, W, 3) or (H, W) uint8.

    Supports SOF0, multiple DQT/DHT segments, restart intervals (DRI/RSTn),
    component sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), and skips
    APPn/COM segments. Progressive (SOF2) and arithmetic coding raise.
    """
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    luts: dict[int, np.ndarray] = {}  # key (tc<<4)|th
    frame = None  # (h, w, [(cid, sh, sv, tq)])
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte — resync on the next 0xFF
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq_, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq_:
                    vals = np.frombuffer(seg[off + 1 : off + 129], dtype=">u2").astype(np.int64)
                    off += 129
                else:
                    vals = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8).astype(np.int64)
                    off += 65
                # stored zigzag -> keep zigzag order (we quantize in zigzag space)
                qtabs[tq] = vals
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tcth = seg[off]
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                luts[tcth] = _decode_lut(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline-sequential JPEG is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cs, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_comps.append((cs, tabs >> 4, tabs & 0x0F))
            scan = (scan_comps, pos + seglen)
            break
        pos += seglen

    if frame is None or scan is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")
    fh, fw, comps = frame
    scan_comps, entropy_start = scan

    # Split entropy-coded data at RST markers, un-stuffing 0xFF00.
    intervals: list[bytes] = []
    cur = bytearray()
    p = entropy_start
    end = len(data)
    while p < end:
        b = data[p]
        if b == 0xFF and p + 1 < end:
            nxt = data[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                intervals.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    intervals.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    by_id = {c[0]: c for c in comps}
    order = []  # per scan component: (comp_index, sh, sv, dc_lut, ac_lut, tq)
    for cs, td, ta in scan_comps:
        cid, sh, sv, tq = by_id[cs]
        order.append((comps.index(by_id[cs]), sh, sv, luts[td], luts[0x10 | ta], tq))

    coef = [
        np.zeros((mcus_y * sv, mcus_x * sh, 64), dtype=np.int32)
        for (_, sh, sv, _, _, _) in order
    ]

    n_mcus = mcus_x * mcus_y
    mcu_idx = 0
    preds = [0] * len(order)
    for interval in intervals:
        br = _BitReader(interval)
        preds = [0] * len(order)
        limit = (
            min(mcu_idx + restart_interval, n_mcus) if restart_interval else n_mcus
        )
        while mcu_idx < limit:
            my, mx = divmod(mcu_idx, mcus_x)
            for si, (_, sh, sv, dc_lut, ac_lut, _) in enumerate(order):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coef[si][my * sv + by, mx * sh + bx]
                        # DC
                        e = int(dc_lut[br.peek16()])
                        sym, ln = e >> 8, e & 0xFF
                        if ln == 0:
                            raise ValueError("invalid Huffman code (DC)")
                        br.skip(ln)
                        preds[si] += _extend(br.read(sym), sym)
                        zz[0] = preds[si]
                        # AC
                        k = 1
                        while k < 64:
                            e = int(ac_lut[br.peek16()])
                            sym, ln = e >> 8, e & 0xFF
                            if ln == 0:
                                raise ValueError("invalid Huffman code (AC)")
                            br.skip(ln)
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC coefficient overrun")
                            zz[k] = _extend(br.read(size), size)
                            k += 1
            mcu_idx += 1
        if mcu_idx >= n_mcus:
            break

    planes = []
    for si, (ci, sh, sv, _, _, tq) in enumerate(order):
        plane = _dequant_idct(coef[si], qtabs[tq])
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
