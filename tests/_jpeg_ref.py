"""Test-side JPEG ENCODERS — the oracle for the native decoder.

Deliberately independent of the decoder's internals: builds its own
zigzag walk, its own (fixed-length) Huffman tables emitted via DHT, and
standard JFIF color/DCT math.  Fixed-length codes (every DC symbol 4
bits, every AC symbol 8 bits) are valid canonical Huffman tables per
ITU T.81 — terrible compression, zero table-memorization risk, and they
exercise the decoder's DHT parsing exactly like optimized tables would.

Three encoders share one coefficient pipeline (`_prep`):

- :func:`encode_jpeg` — sequential single interleaved scan: SOF0 at
  the default 8-bit precision (the r9 oracle), SOF1 extended
  sequential at ``precision=12`` (uint16 input, 2048 level shift, DC
  categories to 15 / AC sizes to 14 on 5-/8-bit fixed codes).
- :func:`encode_jpeg_noninterleaved` — sequential with one
  single-component scan per component (T.81 A.2.2 non-interleaved
  order): multi-scan sequential streams.
- :func:`encode_jpeg_progressive` — progressive (SOF2) with a
  libjpeg-shaped default scan script (spectral selection + successive
  approximation, cross-block EOB runs, AC refinement correction bits
  per T.81 G.1.2), or any caller-supplied script; 8- or 12-bit.

Because successive approximation is a LOSSLESS re-encoding of the same
quantized coefficients, a full progressive script must decode to pixels
IDENTICAL to the sequential encoding of the same image — the strongest
oracle the progressive decoder can face (no tolerance to hide behind).

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
# progressive AC table: EOBn (n = 0..14 run-length bits), ZRL, and the
# run/size symbols (size capped at 10 as above) — 176 symbols, still a
# valid fixed-8-bit canonical table
_ACP_SYMS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
# 12-bit variants: DC categories reach 15 (diffs to +-4095 after the
# wider level shift), AC sizes reach 14 — 16 DC symbols at 5 bits,
# 226 / 240 AC symbols at 8 bits
_DC12_SYMS = list(range(16))
_AC12_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]
_ACP12_SYMS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]


def _fixed_table(symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {sym: (length, i) for i, sym in enumerate(symbols)}
    assert len(symbols) < (1 << length)  # keep the all-ones code unused
    return counts, symbols, codes


_DC_COUNTS, _, _DC_CODES = _fixed_table(_DC_SYMS, 4)
_AC_COUNTS, _, _AC_CODES = _fixed_table(_AC_SYMS, 8)
_ACP_COUNTS, _, _ACP_CODES = _fixed_table(_ACP_SYMS, 8)
_DC12_COUNTS, _, _DC12_CODES = _fixed_table(_DC12_SYMS, 5)
_AC12_COUNTS, _, _AC12_CODES = _fixed_table(_AC12_SYMS, 8)
_ACP12_COUNTS, _, _ACP12_CODES = _fixed_table(_ACP12_SYMS, 8)
# lossless (SOF3): DIFF categories 0..16 (SSSS=16 = diff 32768, no
# appended bits) — 17 symbols on a fixed 5-bit table
_DCL_SYMS = list(range(17))
_DCL_COUNTS, _, _DCL_CODES = _fixed_table(_DCL_SYMS, 5)


def _tables(precision):
    """(dc_counts, dc_syms, dc_codes, ac_counts, ac_syms, ac_codes,
    acp_counts, acp_syms, acp_codes) for the sample precision."""
    if precision == 12:
        return (_DC12_COUNTS, _DC12_SYMS, _DC12_CODES,
                _AC12_COUNTS, _AC12_SYMS, _AC12_CODES,
                _ACP12_COUNTS, _ACP12_SYMS, _ACP12_CODES)
    return (_DC_COUNTS, _DC_SYMS, _DC_CODES,
            _AC_COUNTS, _AC_SYMS, _AC_CODES,
            _ACP_COUNTS, _ACP_SYMS, _ACP_CODES)


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


def _put_dc_diff(w, diff, dc_codes):
    t = _category(diff)
    ln, code = dc_codes[t]
    w.put(code, ln)
    if t:
        w.put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _encode_block(w, coefs_zz, pred, dc_codes, ac_codes):
    _put_dc_diff(w, int(coefs_zz[0]) - pred, dc_codes)
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


def _plane_blocks(plane, q, center=128.0):
    """(bh, bw, 64) quantized zigzag coefficients for an 8-aligned plane."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - center
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


def _prep(arr, q_luma, q_chroma, subsampling, precision=8,
          cmyk_transform=None):
    """Shared pipeline: color convert, subsample, pad to the MCU grid,
    and quantize every component into an (bh, bw, 64) zigzag coefficient
    grid.  Returns the per-component metadata all three encoders walk.
    ``precision`` 8 or 12 sets the level shift (2^(P-1)), clip ceiling,
    and chroma center per T.81 A.3.1.  A 4-channel array encodes as
    CMYK: ``cmyk_transform`` 0 stores the planes untouched, 2 (YCCK)
    YCbCr-transforms the first three; the flag is emitted in an Adobe
    APP14 segment."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    center = float(1 << (precision - 1))
    maxval = (1 << precision) - 1
    q_luma = (
        np.ones(64, dtype=np.int32) if q_luma is None else np.asarray(q_luma)
    )
    q_chroma = q_luma if q_chroma is None else np.asarray(q_chroma)
    h, w = arr.shape[:2]

    if not gray and arr.shape[2] == 3 and cmyk_transform == 0:
        # Adobe transform 0 with 3 components: RGB stored untouched
        comps = [
            (f"C{i}", arr[:, :, i].astype(np.float64), 1, 1, 0)
            for i in range(3)
        ]
        hmax = vmax = 1
    elif not gray and arr.shape[2] == 4:
        if cmyk_transform not in (0, 2):
            raise ValueError("4-channel input needs cmyk_transform 0 or 2")
        chans = [arr[:, :, i].astype(np.float64) for i in range(4)]
        if cmyk_transform == 2:
            a, b2, c2 = chans[:3]
            y = 0.299 * a + 0.587 * b2 + 0.114 * c2
            cb = center - 0.168736 * a - 0.331264 * b2 + 0.5 * c2
            cr = center + 0.5 * a - 0.418688 * b2 - 0.081312 * c2
            planes4 = [y, cb, cr, chans[3]]
            tqs = [0, 1, 1, 0]
        else:
            planes4 = chans
            tqs = [0, 0, 0, 0]
        comps = [
            (f"C{i}", pl, 1, 1, tq)
            for i, (pl, tq) in enumerate(zip(planes4, tqs))
        ]
        hmax = vmax = 1
    elif gray:
        comps = [("Y", arr.astype(np.float64), 1, 1, 0)]
        hmax = vmax = 1
    else:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = center - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = center + 0.5 * r - 0.418688 * g - 0.081312 * b
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
        p = np.clip(np.round(plane), 0, maxval)
        p = np.pad(
            p,
            ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
            mode="edge",
        )
        coef_grids.append(
            _plane_blocks(p, q_luma if tq == 0 else q_chroma, center)
        )
    return {
        "h": h,
        "w": w,
        "gray": gray,
        "adobe": cmyk_transform,
        "precision": precision,
        "q_luma": q_luma,
        "q_chroma": q_chroma,
        # (hs, vs, tq) per component, frame order
        "comps": [(hs, vs, tq) for _n, _p, hs, vs, tq in comps],
        "grids": coef_grids,
        "hmax": hmax,
        "vmax": vmax,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
    }


def _sof(p, marker):
    sof = (
        bytes([p["precision"]])
        + p["h"].to_bytes(2, "big")
        + p["w"].to_bytes(2, "big")
    )
    sof += bytes([len(p["comps"])])
    for i, (hs, vs, tq) in enumerate(p["comps"]):
        sof += bytes([i + 1, (hs << 4) | vs, tq])
    return _seg(marker, sof)


def _comp_block_grid(p, ci):
    """Non-interleaved walk dims (T.81 A.2.2): the component's OWN
    ceil-dims block grid, which can be smaller than its padded
    MCU-grid coefficient plane."""
    hs, vs, _tq = p["comps"][ci]
    cw = (p["w"] * hs + p["hmax"] - 1) // p["hmax"]
    ch = (p["h"] * vs + p["vmax"] - 1) // p["vmax"]
    return (ch + 7) // 8, (cw + 7) // 8


def encode_jpeg(
    arr: np.ndarray,
    q_luma=None,
    q_chroma=None,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
    cmyk_transform: int | None = None,
) -> bytes:
    """Encode an (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) CMYK
    array as a sequential JFIF JPEG (single interleaved scan): uint8
    input under SOF0 at the default precision, or uint16 0..4095 input
    under SOF1 when ``precision=12`` (T.81 extended sequential).
    ``q_luma``/``q_chroma`` are 64-entry natural-order quant tables
    (default all-ones = near-lossless).  4-channel input requires
    ``cmyk_transform`` (0 = planes as stored, 2 = Adobe YCCK) and
    emits the matching APP14 segment."""
    p = _prep(arr, q_luma, q_chroma, subsampling, precision,
              cmyk_transform)
    gray = p["gray"]
    dc_counts, dc_syms, dc_codes, ac_counts, ac_syms, ac_codes, _, _, _ = \
        _tables(precision)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    if p["adobe"] is not None:
        out += _seg(
            0xEE,
            b"Adobe" + bytes([0, 100, 0, 0, 0, 0]) + bytes([p["adobe"]]),
        )
    out += _dqt(0, p["q_luma"])
    if not gray:
        out += _dqt(1, p["q_chroma"])
    out += _sof(p, 0xC0 if precision == 8 else 0xC1)
    out += _dht(0, 0, dc_counts, dc_syms)
    out += _dht(1, 0, ac_counts, ac_syms)
    if not gray:
        out += _dht(0, 1, dc_counts, dc_syms)
        out += _dht(1, 1, ac_counts, ac_syms)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    ncomp = len(p["comps"])
    sos = bytes([ncomp])
    for i, (_hs, _vs, tq) in enumerate(p["comps"]):
        sos += bytes([i + 1, (tq << 4) | tq])  # table id == comp class
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(p["mcus_y"]):
        for mx in range(p["mcus_x"]):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                wtr.marker(0xD0 + (rst % 8))
                rst += 1
                pred = [0] * ncomp
            for ci, (hs, vs, _tq) in enumerate(p["comps"]):
                for v in range(vs):
                    for hsub in range(hs):
                        zz = p["grids"][ci][my * vs + v, mx * hs + hsub]
                        pred[ci] = _encode_block(
                            wtr, zz, pred[ci], dc_codes, ac_codes
                        )
            mcu_count += 1
    wtr.pad()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_noninterleaved(
    arr: np.ndarray,
    q_luma=None,
    q_chroma=None,
    subsampling: str = "444",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Sequential (SOF0; SOF1 at precision=12) multi-scan stream: one
    single-component SOS per component, each walked in the component's
    own block raster order (T.81 A.2.2 non-interleaved).  Restart
    interval counts data units; the RSTn sequence and DC predictor
    reset per scan."""
    p = _prep(arr, q_luma, q_chroma, subsampling, precision)
    gray = p["gray"]
    dc_counts, dc_syms, dc_codes, ac_counts, ac_syms, ac_codes, _, _, _ = \
        _tables(precision)

    out = bytearray()
    out += b"\xff\xd8"
    out += _dqt(0, p["q_luma"])
    if not gray:
        out += _dqt(1, p["q_chroma"])
    out += _sof(p, 0xC0 if precision == 8 else 0xC1)
    out += _dht(0, 0, dc_counts, dc_syms)
    out += _dht(1, 0, ac_counts, ac_syms)
    if not gray:
        out += _dht(0, 1, dc_counts, dc_syms)
        out += _dht(1, 1, ac_counts, ac_syms)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    for ci, (_hs, _vs, tq) in enumerate(p["comps"]):
        sos = bytes([1, ci + 1, (tq << 4) | tq, 0, 63, 0])
        out += _seg(0xDA, sos)
        wtr = _BitWriter()
        pred = 0
        rst = 0
        count = 0
        nby, nbx = _comp_block_grid(p, ci)
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and count and (
                    count % restart_interval == 0
                ):
                    wtr.marker(0xD0 + (rst % 8))
                    rst += 1
                    pred = 0
                pred = _encode_block(
                    wtr, p["grids"][ci][by, bx], pred, dc_codes, ac_codes
                )
                count += 1
        wtr.pad()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------ progressive (SOF2) --

def default_progressive_scans(ncomp: int) -> list:
    """A libjpeg-shaped script: DC initial at Al=1, luma AC split into
    two spectral bands at Al=2 with a two-step refinement chain, chroma
    AC at Al=1 with one refinement, DC refinement to Al=0.  Covers
    every scan kind the decoder implements and is LOSSLESS (every
    coefficient ends at Al=0)."""
    if ncomp == 1:
        return [
            dict(comps=[0], ss=0, se=0, ah=0, al=1),
            dict(comps=[0], ss=1, se=5, ah=0, al=2),
            dict(comps=[0], ss=6, se=63, ah=0, al=2),
            dict(comps=[0], ss=1, se=63, ah=2, al=1),
            dict(comps=[0], ss=0, se=0, ah=1, al=0),
            dict(comps=[0], ss=1, se=63, ah=1, al=0),
        ]
    if ncomp == 4:  # CMYK/YCCK: the 3-comp script + K as a luma-like comp
        return [
            dict(comps=[0, 1, 2, 3], ss=0, se=0, ah=0, al=1),
            dict(comps=[0], ss=1, se=5, ah=0, al=2),
            dict(comps=[1], ss=1, se=63, ah=0, al=1),
            dict(comps=[2], ss=1, se=63, ah=0, al=1),
            dict(comps=[3], ss=1, se=63, ah=0, al=1),
            dict(comps=[0], ss=6, se=63, ah=0, al=2),
            dict(comps=[0], ss=1, se=63, ah=2, al=1),
            dict(comps=[0, 1, 2, 3], ss=0, se=0, ah=1, al=0),
            dict(comps=[0], ss=1, se=63, ah=1, al=0),
            dict(comps=[1], ss=1, se=63, ah=1, al=0),
            dict(comps=[2], ss=1, se=63, ah=1, al=0),
            dict(comps=[3], ss=1, se=63, ah=1, al=0),
        ]
    return [
        dict(comps=[0, 1, 2], ss=0, se=0, ah=0, al=1),
        dict(comps=[0], ss=1, se=5, ah=0, al=2),
        dict(comps=[1], ss=1, se=63, ah=0, al=1),
        dict(comps=[2], ss=1, se=63, ah=0, al=1),
        dict(comps=[0], ss=6, se=63, ah=0, al=2),
        dict(comps=[0], ss=1, se=63, ah=2, al=1),
        dict(comps=[0, 1, 2], ss=0, se=0, ah=1, al=0),
        dict(comps=[0], ss=1, se=63, ah=1, al=0),
        dict(comps=[1], ss=1, se=63, ah=1, al=0),
        dict(comps=[2], ss=1, se=63, ah=1, al=0),
    ]


def _flush_eobrun(wtr, ac_codes, state):
    """Emit the pending EOBn symbol (nbits run-length bits + low-bit
    extension, T.81 G.1.2.2) followed by the correction bits buffered
    for the run's blocks (G.1.2.3)."""
    run = state["eobrun"]
    if run:
        nbits = run.bit_length() - 1
        ln, code = ac_codes[nbits << 4]
        wtr.put(code, ln)
        if nbits:
            wtr.put(run & ((1 << nbits) - 1), nbits)
        state["eobrun"] = 0
    if state["pending"]:
        for bit in state["pending"]:
            wtr.put(bit, 1)
        state["pending"] = []


def _encode_ac_first_block(wtr, zz, ss, se, al, ac_codes, state):
    """AC initial scan for one block: point-transformed (truncate
    toward zero by 2^Al) coefficients, ZRL runs, deferred cross-block
    EOB runs."""
    vals = []
    last = ss - 1
    for k in range(ss, se + 1):
        x = int(zz[k])
        v = (abs(x) >> al) * (1 if x >= 0 else -1)
        vals.append(v)
        if v:
            last = k
    if last < ss:  # whole band zero at this precision: join the run
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, state)
        return
    _flush_eobrun(wtr, ac_codes, state)
    r = 0
    for k in range(ss, last + 1):
        v = vals[k - ss]
        if v == 0:
            r += 1
            continue
        while r > 15:
            ln, code = ac_codes[0xF0]
            wtr.put(code, ln)
            r -= 16
        s = _category(v)
        ln, code = ac_codes[(r << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if last < se:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, state)


def _encode_ac_refine_block(wtr, zz, ss, se, al, ac_codes, state):
    """AC refinement for one block (T.81 G.1.2.3, the libjpeg
    formulation): newly-significant coefficients (|v|>>Al == 1) emit a
    run/1 symbol + sign bit; already-significant ones buffer their next
    magnitude bit, emitted after the next symbol; trailing zero-history
    positions and their buffered corrections fold into the cross-block
    EOB run."""
    temp = []
    sign = []
    eob = ss - 1
    for k in range(ss, se + 1):
        x = int(zz[k])
        t = abs(x) >> al
        temp.append(t)
        sign.append(1 if x >= 0 else 0)
        if t == 1:
            eob = k
    r = 0
    br = []
    for k in range(ss, se + 1):
        t = temp[k - ss]
        if t == 0:
            r += 1
            continue
        # ZRL only when another newly-significant coefficient follows;
        # otherwise the zeros fold into the EOB run
        while r > 15 and k <= eob:
            _flush_eobrun(wtr, ac_codes, state)
            ln, code = ac_codes[0xF0]
            wtr.put(code, ln)
            r -= 16
            for bit in br:
                wtr.put(bit, 1)
            br = []
        if t > 1:
            # already significant: next magnitude bit rides behind the
            # next emitted symbol
            br.append(t & 1)
            continue
        _flush_eobrun(wtr, ac_codes, state)
        ln, code = ac_codes[(r << 4) | 1]
        wtr.put(code, ln)
        wtr.put(sign[k - ss], 1)
        for bit in br:
            wtr.put(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["pending"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, state)


def encode_jpeg_progressive(
    arr: np.ndarray,
    q_luma=None,
    q_chroma=None,
    subsampling: str = "444",
    restart_interval: int = 0,
    scans=None,
    precision: int = 8,
    cmyk_transform: int | None = None,
) -> bytes:
    """Encode as a progressive (SOF2) JFIF JPEG.  ``scans`` is a list
    of ``dict(comps=[frame indexes], ss, se, ah, al)`` in emission
    order (default :func:`default_progressive_scans`).  DHT segments
    are emitted lazily immediately before the first scan that needs
    each table, so multi-scan table (re)definition is exercised.
    Restart interval counts MCUs (interleaved DC scans) or data units
    (single-component scans); EOB runs never cross a restart.
    ``precision=12`` emits a 12-bit SOF2 stream (uint16 0..4095
    input).  4-channel input requires ``cmyk_transform`` (0 or 2,
    Adobe APP14)."""
    p = _prep(arr, q_luma, q_chroma, subsampling, precision,
              cmyk_transform)
    dc_counts, dc_syms, dc_codes, _, _, _, acp_counts, acp_syms, \
        acp_codes = _tables(precision)
    ncomp = len(p["comps"])
    if scans is None:
        scans = default_progressive_scans(ncomp)

    out = bytearray()
    out += b"\xff\xd8"
    if p["adobe"] is not None:
        out += _seg(
            0xEE,
            b"Adobe" + bytes([0, 100, 0, 0, 0, 0]) + bytes([p["adobe"]]),
        )
    out += _dqt(0, p["q_luma"])
    if not p["gray"]:
        out += _dqt(1, p["q_chroma"])
    out += _sof(p, 0xC2)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    emitted = set()
    for scan in scans:
        ss, se = scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        cis = scan["comps"]
        # lazily emit the Huffman tables this scan decodes with
        need = []
        if ss == 0 and ah == 0:
            need += [(0, p["comps"][ci][2]) for ci in cis]
        if ss > 0:
            need += [(1, p["comps"][ci][2]) for ci in cis]
        for cls, tid in need:
            if (cls, tid) in emitted:
                continue
            emitted.add((cls, tid))
            if cls == 0:
                out += _dht(0, tid, dc_counts, dc_syms)
            else:
                out += _dht(1, tid, acp_counts, acp_syms)

        sos = bytes([len(cis)])
        for ci in cis:
            tq = p["comps"][ci][2]
            sos += bytes([ci + 1, (tq << 4) | tq])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)

        wtr = _BitWriter()
        state = {"eobrun": 0, "pending": []}
        pred = [0] * ncomp
        rst = 0
        count = 0

        def unit(ci, by, bx):
            zz = p["grids"][ci][by, bx]
            if ss == 0 and ah == 0:  # DC initial (arithmetic shift)
                v = int(zz[0]) >> al
                _put_dc_diff(wtr, v - pred[ci], dc_codes)
                pred[ci] = v
            elif ss == 0:  # DC refinement: one raw bit
                wtr.put((int(zz[0]) >> al) & 1, 1)
            elif ah == 0:
                _encode_ac_first_block(
                    wtr, zz, ss, se, al, acp_codes, state
                )
            else:
                _encode_ac_refine_block(
                    wtr, zz, ss, se, al, acp_codes, state
                )

        def maybe_restart():
            nonlocal rst
            if restart_interval and count and (
                count % restart_interval == 0
            ):
                _flush_eobrun(wtr, acp_codes, state)
                wtr.marker(0xD0 + (rst % 8))
                rst += 1
                for i in range(ncomp):
                    pred[i] = 0

        if len(cis) == 1:
            ci = cis[0]
            nby, nbx = _comp_block_grid(p, ci)
            for by in range(nby):
                for bx in range(nbx):
                    maybe_restart()
                    unit(ci, by, bx)
                    count += 1
        else:
            for my in range(p["mcus_y"]):
                for mx in range(p["mcus_x"]):
                    maybe_restart()
                    for ci in cis:
                        hs, vs, _tq = p["comps"][ci]
                        for v in range(vs):
                            for hsub in range(hs):
                                unit(ci, my * vs + v, mx * hs + hsub)
                    count += 1
        _flush_eobrun(wtr, acp_codes, state)
        wtr.pad()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_lossless(
    arr: np.ndarray,
    predictor: int = 4,
    point_transform: int = 0,
    precision: int | None = None,
    interleaved: bool = True,
) -> bytes:
    """Encode as a LOSSLESS (SOF3, T.81 Annex H) JPEG: predictive DPCM
    with the selected predictor (1..7), Huffman DIFF categories on a
    fixed 5-bit table (0..16; SSSS=16 encodes diff 32768 with no
    appended bits), mod-2^16 differences, first-row/column fallbacks,
    and ``point_transform`` right-shifting samples before coding (the
    decoder re-shifts, so decode == (input >> Pt) << Pt — EXACT at
    Pt=0).  (h, w) or (h, w, C<=4) input, any precision 2..16
    (default: 8 for uint8 input, 16 otherwise); ``interleaved=False``
    emits one scan per component instead of one multi-component
    scan."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    samples = (arr.astype(np.int64) >> point_transform)
    default = 1 << (precision - 1 - point_transform)

    out = bytearray()
    out += b"\xff\xd8"
    sof = bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])  # 1x1 sampling; Tq unused (=0)
    out += _seg(0xC3, sof)
    out += _dht(0, 0, _DCL_COUNTS, _DCL_SYMS)

    def put_diff(wtr, diff):
        d = diff & 0xFFFF
        if d == 32768:
            ln, code = _DCL_CODES[16]
            wtr.put(code, ln)
            return
        signed = d - 65536 if d > 32768 else d
        t = _category(signed)
        ln, code = _DCL_CODES[t]
        wtr.put(code, ln)
        if t:
            wtr.put(signed if signed >= 0 else signed + (1 << t) - 1, t)

    def scan_bytes(comp_ids):
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])  # DC table 0
        sos += bytes([predictor, 0, point_transform])
        wtr = _BitWriter()
        for y in range(h):
            for x in range(w):
                for ci in comp_ids:
                    plane = samples[:, :, ci]
                    if y == 0 and x == 0:
                        px = default
                    elif y == 0:
                        px = plane[0, x - 1]
                    elif x == 0:
                        px = plane[y - 1, 0]
                    else:
                        ra, rb, rc = (
                            plane[y, x - 1],
                            plane[y - 1, x],
                            plane[y - 1, x - 1],
                        )
                        px = [
                            None, ra, rb, rc, ra + rb - rc,
                            ra + ((rb - rc) >> 1), rb + ((ra - rc) >> 1),
                            (ra + rb) >> 1,
                        ][predictor]
                    put_diff(wtr, int(plane[y, x]) - int(px))
        wtr.pad()
        return _seg(0xDA, sos) + bytes(wtr.out)

    if interleaved:
        out += scan_bytes(list(range(ncomp)))
    else:
        for ci in range(ncomp):
            out += scan_bytes([ci])
    out += b"\xff\xd9"
    return bytes(out)
