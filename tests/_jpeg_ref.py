"""Test-side baseline JPEG ENCODER — the oracle for the native decoder.

Deliberately independent of the decoder's internals: builds its own
zigzag walk, its own (fixed-length) Huffman tables emitted via DHT, and
standard JFIF color/DCT math.  Fixed-length codes (every DC symbol 4
bits, every AC symbol 8 bits) are valid canonical Huffman tables per
ITU T.81 — terrible compression, zero table-memorization risk, and they
exercise the decoder's DHT parsing exactly like optimized tables would.

Shared-bug risk is covered by the analytic tests in
test_multimodal.py: flat images decode EXACTLY (DC-only path has no
rounding), so zigzag/scale/level-shift errors cannot cancel between
encoder and decoder.
"""

from __future__ import annotations

import numpy as np

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    m = np.zeros((8, 8))
    for u in range(8):
        alpha = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * alpha * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_DCT = _dct_matrix()

# fixed-length canonical tables: DC = 12 categories at 4 bits,
# AC = EOB + ZRL + (run 0..15 x size 1..10) at 8 bits
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _fixed_table(symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (length, i) for i, sym in enumerate(symbols)}
    assert len(symbols) < (1 << length)  # keep the all-ones code unused
    return counts, symbols, codes


_DC_COUNTS, _, _DC_CODES = _fixed_table(_DC_SYMS, 4)
_AC_COUNTS, _, _AC_CODES = _fixed_table(_AC_SYMS, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.put(1, 1)

    def marker(self, m):
        self.pad()
        self.out += bytes([0xFF, m])


def _category(v):
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def _encode_block(w, coefs_zz, pred, dc_codes, ac_codes):
    diff = int(coefs_zz[0]) - pred
    t = _category(diff)
    ln, code = dc_codes[t]
    w.put(code, ln)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coefs_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coefs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            w.put(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]
        w.put(code, ln)
    return int(coefs_zz[0])


def _plane_blocks(plane, q):
    """(bh, bw, 64) quantized zigzag coefficients for an 8-aligned plane."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coefs = np.einsum("ux,yrxc,vc->yruv", _DCT, blocks, _DCT)
    qz = np.round(coefs.reshape(bh, bw, 64)[:, :, ZZ] / np.asarray(q)[ZZ])
    return qz.astype(np.int32)


def _pad_to(plane, mult_h, mult_w):
    h, w = plane.shape
    ph = (mult_h - h % mult_h) % mult_h
    pw = (mult_w - w % mult_w) % mult_w
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _seg(marker, body):
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt(tid, q):
    """8-bit table by default; emits a 16-bit (Pq=1) table when any
    entry exceeds 255.  NOTE: T.81 B.2.4.1 forbids 16-bit quant tables
    in 8-bit (SOF0) processes, so such a stream is deliberately
    NON-conformant — real-world lenient decoders (and ours) parse it
    anyway, and the fixture exists precisely to pin that prec=1 parse
    path; keep q <= 255 for conformant output."""
    if max(int(x) for x in q) > 255:
        body = bytes([0x10 | tid]) + b"".join(
            int(q[z]).to_bytes(2, "big") for z in ZZ
        )
        return _seg(0xDB, body)
    return _seg(0xDB, bytes([tid]) + bytes(int(q[z]) for z in ZZ))


def _dht(cls, tid, counts, symbols):
    return _seg(
        0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)
    )


def encode_jpeg(
    arr: np.ndarray,
    q_luma=None,
    q_chroma=None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG.  ``q_luma``/``q_chroma`` are 64-entry natural-
    order quant tables (default all-ones = near-lossless)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    q_luma = np.ones(64, dtype=np.int32) if q_luma is None else np.asarray(q_luma)
    q_chroma = q_luma if q_chroma is None else np.asarray(q_chroma)
    h, w = arr.shape[:2]

    if gray:
        comps = [("Y", arr.astype(np.float64), 1, 1, 0)]
        hmax = vmax = 1
    else:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "444":
            sub = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "422":
            sub = [(2, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            sub = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling}")
        hmax = max(s[0] for s in sub)
        vmax = max(s[1] for s in sub)
        planes = []
        for plane, (hs, vs) in zip((y, cb, cr), sub):
            if (hs, vs) != (hmax, vmax):
                # box-average down by the sampling ratio
                ry, rx = vmax // vs, hmax // hs
                p = _pad_to(plane, ry, rx)
                ph, pw = p.shape
                p = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
            else:
                p = plane
            planes.append(p)
        comps = [
            ("Y", planes[0], sub[0][0], sub[0][1], 0),
            ("Cb", planes[1], sub[1][0], sub[1][1], 1),
            ("Cr", planes[2], sub[2][0], sub[2][1], 1),
        ]

    # pad every plane so the MCU grid is complete, then block-encode
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    coef_grids = []
    for _name, plane, hs, vs, tq in comps:
        target_h, target_w = mcus_y * vs * 8, mcus_x * hs * 8
        p = np.clip(np.round(plane), 0, 255)
        p = np.pad(
            p,
            ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
            mode="edge",
        )
        coef_grids.append(
            _plane_blocks(p, q_luma if tq == 0 else q_chroma)
        )

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _dqt(0, q_luma)
    if not gray:
        out += _dqt(1, q_chroma)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for i, (_n, _p, hs, vs, tq) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, tq])
    out += _seg(0xC0, sof)
    out += _dht(0, 0, _DC_COUNTS, _DC_SYMS)
    out += _dht(1, 0, _AC_COUNTS, _AC_SYMS)
    if not gray:
        out += _dht(0, 1, _DC_COUNTS, _DC_SYMS)
        out += _dht(1, 1, _AC_COUNTS, _AC_SYMS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for i, (_n, _p, _hs, _vs, tq) in enumerate(comps):
        sos += bytes([i + 1, (tq << 4) | tq])  # table id == comp class
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    pred = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                wtr.marker(0xD0 + (rst % 8))
                rst += 1
                pred = [0] * len(comps)
            for ci, (_n, _p, hs, vs, _tq) in enumerate(comps):
                for v in range(vs):
                    for hsub in range(hs):
                        zz = coef_grids[ci][my * vs + v, mx * hs + hsub]
                        pred[ci] = _encode_block(
                            wtr, zz, pred[ci], _DC_CODES, _AC_CODES
                        )
            mcu_count += 1
    wtr.pad()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
