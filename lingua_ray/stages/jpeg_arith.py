"""Arithmetic-coded JPEG (SOF9) — QM-coder decode + encoder oracle.

Implements the public ITU-T T.81 specification directly: the Annex D
QM arithmetic coder (probability-state machine of Table D.3, byte
stuffing, carry-over via FF stacking) and the Annex F sequential-DCT
statistical models (Figures F.21-F.24: DC difference contexts with
L/U conditioning classification, per-k AC EOB/zero/magnitude contexts
with the Kx low/high magnitude-ladder split).  No code here derives
from any existing codec implementation; the state-transition table is
transcribed from the published standard (Table D.3) — it is shared by
the encoder and decoder, so round-trip tests validate the coder's
algorithmic structure end-to-end.

Used by :mod:`.jpeg` for SOF9 (sequential) and SOF10 (progressive)
streams; the encoder (:func:`encode_jpeg_arith`) exists as the
decoder's test oracle, the same pattern as the Huffman/progressive
encoders there.
"""
from __future__ import annotations

import numpy as np

# T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) per probability state; row
# 113 is the standard's non-adapting "fixed 0.5" state used for AC
# sign decisions (next-state = itself, no MPS switch).
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]
_QE_V = [q for q, _, _, _ in _QE]
_NMPS = [n for _, n, _, _ in _QE]
_NLPS = [n for _, _, n, _ in _QE]
_SWITCH = [s for _, _, _, s in _QE]

FIXED = 113        # the non-adapting sign context's state index


class Stats:
    """A bank of adaptive binary contexts: state index + MPS bit each.
    The fixed context is pre-seeded to state 113 (self-looping)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = [0] * n
        self.mps = [0] * n

    def fix(self, ctx: int) -> None:
        self.idx[ctx] = FIXED


class ArithDecoder:
    """T.81 Annex D.2 QM decoder over an UNSTUFFED entropy segment
    (0xFF00 already collapsed, restart markers already split off by
    the caller); past-the-end reads feed 1-bits per the marker rule."""

    __slots__ = ("data", "bp", "c", "a", "ct", "fed")

    def __init__(self, data: bytes):
        # Chigh holds the first 16 code bits at full scale (A=0x10000):
        # the DECODE convention here compares Chigh against Qe in the
        # encoder's initial-interval units, so the first stream bit
        # carries weight 0x8000 within Chigh.
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 24
        if len(data) > 1:
            self.bp = 1
            self.c |= data[1] << 16
        else:
            self.c |= 0xFF << 16
        self.ct = 0
        self.a = 0x10000
        self.fed = 0

    def _bytein(self) -> None:
        if self.bp + 1 < len(self.data):
            self.bp += 1
            self.c += self.data[self.bp] << 8
        else:
            # past the marker: feed 1-bits — but only for the bounded
            # tail a legal flush leaves; beyond that the stream is
            # truncated and would otherwise "decode" garbage forever
            self.fed += 1
            if self.fed > 4:
                raise EOFError("arith entropy segment exhausted")
            self.c += 0xFF00
        self.ct = 8

    def decode(self, st: Stats, ctx: int) -> int:
        i = st.idx[ctx]
        qe = _QE_V[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS subinterval (bottom) — or MPS under cond. exchange
            if self.a < qe:
                d = st.mps[ctx]
                st.idx[ctx] = _NMPS[i]
            else:
                d = 1 - st.mps[ctx]
                if _SWITCH[i]:
                    st.mps[ctx] ^= 1
                st.idx[ctx] = _NLPS[i]
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return st.mps[ctx]
            if self.a < qe:
                d = 1 - st.mps[ctx]
                if _SWITCH[i]:
                    st.mps[ctx] ^= 1
                st.idx[ctx] = _NLPS[i]
            else:
                d = st.mps[ctx]
                st.idx[ctx] = _NMPS[i]
        while self.a < 0x8000:          # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return d


class ArithEncoder:
    """T.81 Annex D.1 QM encoder: FF-stacked carry propagation and
    0x00 stuffing after every 0xFF data byte."""

    __slots__ = ("out", "c", "a", "ct", "pending_ff")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.pending_ff = 0

    def _byteout(self) -> None:
        t = self.c >> 19
        self.c &= 0x7FFFF
        if t > 0xFF:                   # carry ripples backward
            if self.pending_ff:
                # stacked 0xFFs become 0x00s, carry continues past them
                if not self.out:
                    raise ValueError("arith carry past segment start")
                self.out[-1] += 1
                if self.out[-1] == 0xFF:
                    self.out.append(0x00)      # restore stuffing
                self.out.extend(b"\x00" * self.pending_ff)
                self.pending_ff = 0
            else:
                if not self.out:
                    raise ValueError("arith carry past segment start")
                self.out[-1] += 1
                if self.out[-1] == 0xFF:
                    self.out.append(0x00)
            t &= 0xFF
        if t == 0xFF:
            self.pending_ff += 1       # hold: a later carry may flip it
            return
        while self.pending_ff:
            self.out.extend(b"\xff\x00")
            self.pending_ff -= 1
        self.out.append(t)

    def code(self, st: Stats, ctx: int, bit: int) -> None:
        i = st.idx[ctx]
        qe = _QE_V[i]
        if bit == st.mps[ctx]:         # CODEMPS: upper subinterval
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:            # cond. exchange: take bottom
                self.a = qe
            else:
                self.c += qe
            st.idx[ctx] = _NMPS[i]
        else:                          # CODELPS: bottom subinterval
            self.a -= qe
            if self.a < qe:            # cond. exchange: take upper
                self.c += qe
            else:
                self.a = qe
            if _SWITCH[i]:
                st.mps[ctx] ^= 1
            st.idx[ctx] = _NLPS[i]
        while self.a < 0x8000:         # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def flush(self) -> bytes:
        # Emit the interval BASE at full precision (4 byteouts cover
        # every remaining C bit) instead of the spec's CLEARBITS
        # trailing-zero shortening: the decoder feeds 1-bits past the
        # segment end, and base + sub-precision-epsilon is interior to
        # [C, C+A) for ANY fed tail, so every coded decision decodes
        # exactly.  Costs <= 2 extra bytes per segment vs CLEARBITS.
        for _ in range(32):            # push 32 zero bits through the
            self.c <<= 1               # normal renorm/byteout path so
            self.ct -= 1               # BYTEOUT's carry invariants hold
            if self.ct == 0:
                self._byteout()
                self.ct = 8
        while self.pending_ff:         # drain held FFs with stuffing
            self.out.extend(b"\xff\x00")
            self.pending_ff -= 1
        return bytes(self.out)


# ------------------------------------------------- statistical models
# DC (Table F.4): 5 classes x (S0, SS, SP, SN) = contexts 0-19,
# X1..X15 = 20-34, M2..M15 = 35-48.  AC (Table F.5): per k=1..63 the
# triplet (EOB, zero, low-magnitude) at 3(k-1), plus two shared
# magnitude ladders at 189 (k <= Kx) and 217 (k > Kx).
_DC_BINS = 49
_AC_BINS = 245


def _decode_dc_diff(dec: ArithDecoder, st: Stats, state: dict,
                    lo: int, up: int) -> int:
    s0 = state["ctx"]
    if not dec.decode(st, s0):
        state["ctx"] = 0
        return 0
    sign = dec.decode(st, s0 + 1)
    m = dec.decode(st, s0 + 2 + sign)
    if m:
        ctx = 20                        # X1
        while dec.decode(st, ctx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            ctx += 1
        ctx += 14                       # matching M bins
    else:
        ctx = 34                        # unused (no mantissa bits)
    # conditioning classification for the NEXT block (F.1.4.4.1.2)
    if m < (1 << lo) >> 1:
        state["ctx"] = 0
    elif m > (1 << up) >> 1:
        state["ctx"] = 12 + 4 * sign
    else:
        state["ctx"] = 4 + 4 * sign
    v = m
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(st, ctx):
            v |= mm
    v += 1
    return -v if sign else v


def _encode_dc_diff(enc: ArithEncoder, st: Stats, state: dict,
                    diff: int, lo: int, up: int) -> None:
    s0 = state["ctx"]
    if diff == 0:
        enc.code(st, s0, 0)
        state["ctx"] = 0
        return
    enc.code(st, s0, 1)
    sign = 1 if diff < 0 else 0
    enc.code(st, s0 + 1, sign)
    sz = abs(diff) - 1
    if sz:
        enc.code(st, s0 + 2 + sign, 1)
        m, ctx, nbits = 1, 20, 0
        while sz >= (m << 1):
            enc.code(st, ctx, 1)
            m <<= 1
            ctx += 1
            nbits += 1
        enc.code(st, ctx, 0)
        mag_ctx = ctx + 14
        m_top = m
        for b in range(nbits - 1, -1, -1):
            enc.code(st, mag_ctx, (sz >> b) & 1)
    else:
        enc.code(st, s0 + 2 + sign, 0)
        m_top = 0
    if m_top < (1 << lo) >> 1:
        state["ctx"] = 0
    elif m_top > (1 << up) >> 1:
        state["ctx"] = 12 + 4 * sign
    else:
        state["ctx"] = 4 + 4 * sign


def _decode_ac_block(dec: ArithDecoder, st: Stats, coef: np.ndarray,
                     zz: np.ndarray, kx: int) -> None:
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):        # EOB
            return
        while not dec.decode(st, base + 1):
            k += 1
            if k > 63:
                raise ValueError("arith AC run past block end")
            base = 3 * (k - 1)
        sign = dec.decode(st, FIX_CTX)
        m = dec.decode(st, base + 2)
        if m and dec.decode(st, base + 2):
            m = 2
            ctx = 189 if k <= kx else 217
            while dec.decode(st, ctx):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith AC magnitude overflow")
                ctx += 1
            ctx += 14
        else:
            ctx = base + 2              # no mantissa bits follow anyway
        v = m
        mm = m
        while mm > 1:
            mm >>= 1
            if dec.decode(st, ctx):
                v |= mm
        v += 1
        coef[zz[k]] = -v if sign else v
        k += 1


def _encode_ac_block(enc: ArithEncoder, st: Stats, coef: np.ndarray,
                     zz: np.ndarray, kx: int) -> None:
    vals = coef[zz]
    eob = 64
    while eob > 1 and vals[eob - 1] == 0:
        eob -= 1
    k = 1
    while k < eob:
        base = 3 * (k - 1)
        enc.code(st, base, 0)           # not EOB
        while vals[k] == 0:
            enc.code(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.code(st, base + 1, 1)
        v = int(vals[k])
        sign = 1 if v < 0 else 0
        enc.code(st, FIX_CTX, sign)
        sz = abs(v) - 1
        if sz == 0:
            enc.code(st, base + 2, 0)
        else:
            enc.code(st, base + 2, 1)
            if sz == 1:
                enc.code(st, base + 2, 0)
                mag_ctx = base + 2      # zero mantissa bits
                nbits = 0
            else:
                enc.code(st, base + 2, 1)
                # m starts at 2, so the mantissa already has one bit
                m, ctx, nbits = 2, (189 if k <= kx else 217), 1
                while sz >= (m << 1):
                    enc.code(st, ctx, 1)
                    m <<= 1
                    ctx += 1
                    nbits += 1
                enc.code(st, ctx, 0)
                mag_ctx = ctx + 14
            for b in range(nbits - 1, -1, -1):
                enc.code(st, mag_ctx, (sz >> b) & 1)
        k += 1
    if k <= 63:
        enc.code(st, 3 * (k - 1), 1)    # EOB


# the AC sign's fixed context lives in its own one-slot bank
FIX_CTX = _AC_BINS                      # appended slot in the AC bank


def _new_dc_stats() -> Stats:
    return Stats(_DC_BINS)


def _new_ac_stats() -> Stats:
    st = Stats(_AC_BINS + 1)
    st.fix(FIX_CTX)
    return st


def decode_arith_scan(p: bytes, start: int, frame, sel, dc_cond,
                      ac_cond, dri: int, pixels: bool):
    """Sequential SOF9 scan: mirrors the Huffman `_decode_scan` MCU
    walk, but entropy-decodes with the QM coder.  Statistics, DC
    predictors and conditioning contexts reset at every restart
    interval (F.1.4.4)."""
    from .jpeg import _ZZ, _assemble, _split_entropy
    comps = frame["comps"]
    if len(sel) != len(comps):
        return None
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for ci, c in enumerate(comps):
        c["bw"], c["bh"] = mcux * c["h"], mcuy * c["v"]
        c["coef"] = (np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
                     if pixels or ci == 0 else None)
        c["dc_tbl"], c["ac_tbl"] = sel[c["id"]]
    segs, _ = _split_entropy(p, start)
    n_mcu = mcux * mcuy
    per_seg = dri if dri else n_mcu
    mcu = 0
    for seg in segs:
        if mcu >= n_mcu:
            break
        dec = ArithDecoder(seg)
        dc_st = {t: _new_dc_stats() for t in {c["dc_tbl"] for c in comps}}
        ac_st = {t: _new_ac_stats() for t in {c["ac_tbl"] for c in comps}}
        for c in comps:
            c["pred"] = 0
            c["dc_state"] = {"ctx": 0}
        end = min(n_mcu, mcu + per_seg)
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for c in comps:
                lo, up = dc_cond.get(c["dc_tbl"], (0, 1))
                kx = ac_cond.get(c["ac_tbl"], 5)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        diff = _decode_dc_diff(dec, dc_st[c["dc_tbl"]],
                                               c["dc_state"], lo, up)
                        c["pred"] += diff
                        coef[_ZZ[0]] = c["pred"]
                        _decode_ac_block(dec, ac_st[c["ac_tbl"]],
                                         coef, _ZZ, kx)
                        if c["coef"] is not None:
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            c["coef"][row * c["bw"] + col] = coef
            mcu += 1
    if mcu < n_mcu:
        return None
    return _assemble(frame, pixels)


# ----------------------------------------- progressive (SOF10) scans


def decode_arith_progressive_scan(p, start, frame, order, sel, dc_cond,
                                  ac_cond, dri: int, band) -> int:
    """One progressive arithmetic SOS (T.81 G.2 scan structure with the
    Annex G arithmetic-coding models); accumulates into the frame's
    coefficient planes and returns the resume offset, mirroring the
    Huffman `_progressive_scan`."""
    from .jpeg import _split_entropy
    ss, se, ah, al = band
    if se > 63 or al > 13 or ah > 13 or (ah and ah != al + 1):
        raise ValueError("bad progressive scan parameters")
    byid = {c["id"]: c for c in frame["comps"]}
    scomps = [byid[cid] for cid in order]
    segs, end = _split_entropy(p, start)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ah == 0:
            _arith_dc_first(segs, frame, scomps, sel, dc_cond, dri, al)
        else:
            _arith_dc_refine(segs, frame, scomps, dri, al)
    else:
        if len(scomps) != 1:
            raise ValueError("progressive AC scans are single-component")
        if ah == 0:
            _arith_ac_first(segs, scomps[0], sel, ac_cond, dri,
                            ss, se, al)
        else:
            _arith_ac_refine(segs, scomps[0], dri, ss, se, al)
    return end


def _prog_units(frame, scomps):
    if len(scomps) > 1:
        return frame["mcux"] * frame["mcuy"], True
    return scomps[0]["nw"] * scomps[0]["nh"], False


def _walk_dc_units(segs, frame, scomps, dri, per_block):
    """Shared unit walk for the two DC scan kinds: calls
    ``per_block(dec, scan_state, c, idx)`` for every block in scan
    order, resetting the coder + statistics at restart boundaries."""
    units, interleaved = _prog_units(frame, scomps)
    per_seg = dri if dri else units
    u = 0
    for seg in segs:
        if u >= units:
            break
        dec = ArithDecoder(seg)
        state = {}
        endu = min(units, u + per_seg)
        while u < endu:
            if interleaved:
                my, mx = divmod(u, frame["mcux"])
                for c in scomps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = ((my * c["v"] + by) * c["bw"]
                                   + mx * c["h"] + bx)
                            per_block(dec, state, c, idx)
            else:
                c = scomps[0]
                my, mx = divmod(u, c["nw"])
                per_block(dec, state, c, my * c["bw"] + mx)
            u += 1
    if u < units:
        raise EOFError("truncated progressive DC scan")


def _arith_dc_first(segs, frame, scomps, sel, dc_cond, dri, al) -> None:
    def per_block(dec, state, c, idx):
        if "st" not in state:
            state["st"] = {}
            for cc in scomps:
                t = sel[cc["id"]][0]
                state["st"].setdefault(t, _new_dc_stats())
                cc["pred"] = 0
                cc["dc_state"] = {"ctx": 0}
        t = sel[c["id"]][0]
        lo, up = dc_cond.get(t, (0, 1))
        c["pred"] += _decode_dc_diff(dec, state["st"][t],
                                     c["dc_state"], lo, up)
        c["coef"][idx, 0] = c["pred"] << al

    _walk_dc_units(segs, frame, scomps, dri, per_block)


def _arith_dc_refine(segs, frame, scomps, dri, al) -> None:
    def per_block(dec, state, c, idx):
        if "fx" not in state:
            state["fx"] = _new_ac_stats()   # only its fixed slot is used
        if dec.decode(state["fx"], FIX_CTX):
            c["coef"][idx, 0] |= 1 << al

    _walk_dc_units(segs, frame, scomps, dri, per_block)


def _arith_ac_first(segs, c, sel, ac_cond, dri, ss, se, al) -> None:
    from .jpeg import _ZZ
    kx = ac_cond.get(sel[c["id"]][1], 5)
    units = c["nw"] * c["nh"]
    per_seg = dri if dri else units
    u = 0
    for seg in segs:
        if u >= units:
            break
        dec = ArithDecoder(seg)
        st = _new_ac_stats()
        endu = min(units, u + per_seg)
        while u < endu:
            my, mx = divmod(u, c["nw"])
            coef = c["coef"][my * c["bw"] + mx]
            k = ss
            while k <= se:
                base = 3 * (k - 1)
                if dec.decode(st, base):            # EOB
                    break
                while not dec.decode(st, base + 1):
                    k += 1
                    if k > se:
                        raise ValueError("arith AC run past band end")
                    base = 3 * (k - 1)
                sign = dec.decode(st, FIX_CTX)
                m = dec.decode(st, base + 2)
                if m and dec.decode(st, base + 2):
                    m = 2
                    ctx = 189 if k <= kx else 217
                    while dec.decode(st, ctx):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError("arith AC magnitude "
                                             "overflow")
                        ctx += 1
                    ctx += 14
                else:
                    ctx = base + 2
                v = m
                mm = m
                while mm > 1:
                    mm >>= 1
                    if dec.decode(st, ctx):
                        v |= mm
                v += 1
                coef[_ZZ[k]] = (-v if sign else v) << al
                k += 1
            u += 1
    if u < units:
        raise EOFError("truncated progressive AC scan")


def _arith_ac_refine(segs, c, dri, ss, se, al) -> None:
    from .jpeg import _ZZ
    p1 = 1 << al
    units = c["nw"] * c["nh"]
    per_seg = dri if dri else units
    u = 0
    for seg in segs:
        if u >= units:
            break
        dec = ArithDecoder(seg)
        st = _new_ac_stats()
        endu = min(units, u + per_seg)
        while u < endu:
            my, mx = divmod(u, c["nw"])
            coef = c["coef"][my * c["bw"] + mx]
            kex = se
            while kex > 0 and coef[_ZZ[kex]] == 0:
                kex -= 1
            k = ss
            while k <= se:
                base = 3 * (k - 1)
                if k > kex and dec.decode(st, base):    # EOB
                    break
                while True:
                    z = _ZZ[k]
                    if coef[z]:
                        if dec.decode(st, base + 2):    # correction
                            coef[z] += p1 if coef[z] > 0 else -p1
                        break
                    if dec.decode(st, base + 1):        # newly nonzero
                        sign = dec.decode(st, FIX_CTX)
                        coef[z] = -p1 if sign else p1
                        break
                    k += 1
                    if k > se:
                        raise ValueError("arith refinement past band")
                    base = 3 * (k - 1)
                k += 1
            u += 1
    if u < units:
        raise EOFError("truncated progressive AC scan")


def _enc_arith_dc_scan(coefs, samp, mcux, mcuy, tables, dc_cond,
                       ah, al) -> bytes:
    enc = ArithEncoder()
    nc = len(coefs)
    if ah == 0:
        st = {t: _new_dc_stats() for t in tables}
        preds = [0] * nc
        states = [{"ctx": 0} for _ in range(nc)]
    else:
        fx = _new_ac_stats()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (sh, sv) in enumerate(samp):
            tbl = 0 if ci == 0 else 1
            for by in range(sv):
                for bx in range(sh):
                    dc = int(coefs[ci][my * sv + by, mx * sh + bx][0])
                    if ah == 0:
                        v = dc >> al
                        _encode_dc_diff(enc, st[tbl], states[ci],
                                        v - preds[ci], *dc_cond)
                        preds[ci] = v
                    else:
                        enc.code(fx, FIX_CTX, (dc >> al) & 1)
    return enc.flush()


def _enc_arith_ac_first(blocks, ss, se, al, kx) -> bytes:
    from .jpeg import _ZZ, _pt
    enc = ArithEncoder()
    st = _new_ac_stats()
    for blk in blocks:
        vals = [_pt(int(blk[_ZZ[k]]), al) for k in range(64)]
        eob = se + 1
        while eob > ss and vals[eob - 1] == 0:
            eob -= 1
        k = ss
        while k < eob:
            base = 3 * (k - 1)
            enc.code(st, base, 0)
            while vals[k] == 0:
                enc.code(st, base + 1, 0)
                k += 1
                base = 3 * (k - 1)
            enc.code(st, base + 1, 1)
            v = vals[k]
            sign = 1 if v < 0 else 0
            enc.code(st, FIX_CTX, sign)
            sz = abs(v) - 1
            if sz == 0:
                enc.code(st, base + 2, 0)
            else:
                enc.code(st, base + 2, 1)
                if sz == 1:
                    enc.code(st, base + 2, 0)
                    mag_ctx, nbits = base + 2, 0
                else:
                    enc.code(st, base + 2, 1)
                    m, ctx, nbits = 2, (189 if k <= kx else 217), 1
                    while sz >= (m << 1):
                        enc.code(st, ctx, 1)
                        m <<= 1
                        ctx += 1
                        nbits += 1
                    enc.code(st, ctx, 0)
                    mag_ctx = ctx + 14
                for b in range(nbits - 1, -1, -1):
                    enc.code(st, mag_ctx, (sz >> b) & 1)
            k += 1
        if k <= se:
            enc.code(st, 3 * (k - 1), 1)        # EOB
    return enc.flush()


def _enc_arith_ac_refine(blocks, ss, se, al) -> bytes:
    from .jpeg import _ZZ, _pt
    enc = ArithEncoder()
    st = _new_ac_stats()
    for blk in blocks:
        now = [_pt(int(blk[_ZZ[k]]), al) for k in range(64)]
        prev = [_pt(int(blk[_ZZ[k]]), al + 1) for k in range(64)]
        kex = se
        while kex > 0 and prev[kex] == 0:
            kex -= 1
        kend = se
        while kend >= ss and now[kend] == 0:
            kend -= 1
        k = ss
        while k <= se:
            base = 3 * (k - 1)
            if k > kex:
                if k > kend:                    # no further events
                    enc.code(st, base, 1)
                    break
                enc.code(st, base, 0)
            while True:
                if prev[k]:
                    enc.code(st, base + 2, abs(now[k]) & 1)
                    break
                if now[k]:
                    enc.code(st, base + 1, 1)
                    enc.code(st, FIX_CTX, 1 if now[k] < 0 else 0)
                    break
                enc.code(st, base + 1, 0)
                k += 1
                base = 3 * (k - 1)
            k += 1
    return enc.flush()


def encode_jpeg_arith(img: np.ndarray, quality: int = 85,
                      subsample: bool = False,
                      restart_interval: int = 0,
                      dc_cond: tuple = (0, 1), ac_kx: int = 5,
                      progressive: bool = False) -> bytes:
    """Arithmetic-coded JPEG encoder (decoder test oracle): SOF9 + DAC
    conditioning (``dc_cond`` = (L, U), ``ac_kx`` = Kx) + one
    interleaved scan, gray or YCbCr 4:4:4 / 4:2:0.
    ``progressive=True`` emits an SOF10 multi-scan stream with the
    same 9-scan script as the Huffman progressive encoder (DC at Al=1
    + refinement, spectral AC bands with successive approximation)."""
    import struct

    from .jpeg import _QCHROM, _QLUM, _ZZ, _fdct_quant, _pad_to, _scaled_q
    img = np.asarray(img)
    gray = img.ndim == 2
    qy = _scaled_q(_QLUM, quality).astype(np.float64)
    qc = _scaled_q(_QCHROM, quality).astype(np.float64)
    h, w = img.shape[:2]
    if gray:
        planes, samp, qsel = [img.astype(np.float64)], [(1, 1)], [0]
    else:
        rgb = img.astype(np.float64)
        y = rgb @ np.array([0.299, 0.587, 0.114])
        cb = (rgb @ np.array([-0.168736, -0.331264, 0.5])) + 128.0
        cr = (rgb @ np.array([0.5, -0.418688, -0.081312])) + 128.0
        if subsample:
            pe = _pad_to(cb, 2, 2)
            cb = pe.reshape(pe.shape[0] // 2, 2,
                            pe.shape[1] // 2, 2).mean(axis=(1, 3))
            pe = _pad_to(cr, 2, 2)
            cr = pe.reshape(pe.shape[0] // 2, 2,
                            pe.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes, qsel = [y, cb, cr], [0, 1, 1]
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for pl, (sh, sv), qs in zip(planes, samp, qsel):
        pl = _pad_to(np.clip(pl, 0, 255), mcuy * sv * 8, mcux * sh * 8)
        coefs.append(_fdct_quant(pl, qy if qs == 0 else qc))

    tables = sorted({0 if ci == 0 else 1 for ci in range(nc)})

    def headers(sof_marker: int) -> bytearray:
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
            + _scaled_q(_QLUM, quality)[_ZZ].astype(np.uint8).tobytes()
        if nc > 1:
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([1]) \
                + _scaled_q(_QCHROM, quality)[_ZZ].astype(
                    np.uint8).tobytes()
        dac = b""
        for t in tables:
            dac += bytes([0x00 | t, (dc_cond[1] << 4) | dc_cond[0]])
            dac += bytes([0x10 | t, ac_kx])
        out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
        sof = struct.pack(">BHHB", 8, h, w, nc)
        for ci in range(nc):
            sh, sv = samp[ci]
            sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
        out += bytes([0xFF, sof_marker]) \
            + struct.pack(">H", 2 + len(sof)) + sof
        return out

    if progressive:
        out = headers(0xCA)

        def comp_blocks(ci):
            sh, sv = samp[ci]
            cw, ch = -(-w * sh // hmax), -(-h * sv // vmax)
            nw, nh = -(-cw // 8), -(-ch // 8)
            return [coefs[ci][r, col] for r in range(nh)
                    for col in range(nw)]

        def sos_scan(comp_ids, ss_, se_, ah_, al_, payload):
            hdr = bytes([len(comp_ids)])
            for cid in comp_ids:
                t = 0 if cid == 0 else 1
                hdr += bytes([cid + 1, (t << 4) | t])
            hdr += bytes([ss_, se_, (ah_ << 4) | al_])
            out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(hdr))
                       + hdr)
            out.extend(payload)

        all_ids = list(range(nc))
        sos_scan(all_ids, 0, 0, 0, 1,
                 _enc_arith_dc_scan(coefs, samp, mcux, mcuy, tables,
                                    dc_cond, 0, 1))
        lb = comp_blocks(0)
        sos_scan([0], 1, 5, 0, 2, _enc_arith_ac_first(lb, 1, 5, 2, ac_kx))
        sos_scan([0], 6, 63, 0, 2,
                 _enc_arith_ac_first(lb, 6, 63, 2, ac_kx))
        for ci in range(1, nc):
            sos_scan([ci], 1, 63, 0, 1,
                     _enc_arith_ac_first(comp_blocks(ci), 1, 63, 1,
                                         ac_kx))
        sos_scan([0], 1, 63, 2, 1, _enc_arith_ac_refine(lb, 1, 63, 1))
        sos_scan([0], 1, 63, 1, 0, _enc_arith_ac_refine(lb, 1, 63, 0))
        sos_scan(all_ids, 0, 0, 1, 0,
                 _enc_arith_dc_scan(coefs, samp, mcux, mcuy, tables,
                                    dc_cond, 1, 0))
        for ci in range(1, nc):
            sos_scan([ci], 1, 63, 1, 0,
                     _enc_arith_ac_refine(comp_blocks(ci), 1, 63, 0))
        out.extend(b"\xff\xd9")
        return bytes(out)

    enc = ArithEncoder()
    dc_st = {t: _new_dc_stats() for t in tables}
    ac_st = {t: _new_ac_stats() for t in tables}
    preds = [0] * nc
    states = [{"ctx": 0} for _ in range(nc)]
    body = bytearray()
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            body += enc.flush()
            body += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            enc = ArithEncoder()
            dc_st = {t: _new_dc_stats() for t in tables}
            ac_st = {t: _new_ac_stats() for t in tables}
            preds = [0] * nc
            states = [{"ctx": 0} for _ in range(nc)]
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            tbl = 0 if ci == 0 else 1
            for by in range(sv):
                for bx in range(sh):
                    blk = coefs[ci][my * sv + by, mx * sh + bx]
                    dc = int(blk[0])
                    _encode_dc_diff(enc, dc_st[tbl], states[ci],
                                    dc - preds[ci], *dc_cond)
                    preds[ci] = dc
                    _encode_ac_block(enc, ac_st[tbl], blk, _ZZ, ac_kx)
    body += enc.flush()

    out = headers(0xC9)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += body + b"\xff\xd9"
    return bytes(out)
