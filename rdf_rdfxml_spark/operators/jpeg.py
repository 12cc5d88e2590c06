"""Baseline JPEG (ITU-T T.81 SOF0) encode/decode in pure numpy — the last
image format of the multimodal suite that previously needed an external
codec library.

Scope (declared): baseline sequential DCT, 8-bit, 4:4:4 (no chroma
subsampling), no restart markers, no progressive/arithmetic modes —
exactly what :func:`encode_jpeg` emits; other baseline streams decode as
long as they stay within that envelope, anything else raises
``DecodeError`` loudly.

Design notes:

* The 2-D DCT/IDCT are exact orthonormal matrix products (``C @ B @ C.T``)
  — no approximation beyond float64 rounding.
* Huffman tables are built **per image** from the actual symbol
  distribution as fixed-length canonical codes (every used symbol gets
  the same code length L with 2^L ≥ n_symbols + 1, keeping the all-ones
  code unused as the spec reserves). That is a valid DHT any conforming
  decoder accepts, and it spares this module from embedding the long
  Annex-K Huffman value lists; the *decoder* implements the general
  canonical BITS/HUFFVAL machinery, so it reads standard-table streams
  too. Quantization tables are the Annex-K luminance/chrominance
  defaults scaled by ``quality``.
"""

from __future__ import annotations

import numpy as np

from .multimodal import DecodeError

# Annex K.1/K.2 default quantization tables (row-major).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * \
            (np.sqrt(0.125) if _k == 0 else 0.5)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), \
        img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + raw bits for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else (v + (1 << s) - 1)
    return s, bits


def _extend(bits: int, s: int) -> int:
    """Inverse of :func:`_magnitude` (spec EXTEND)."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise DecodeError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise DecodeError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = (self.acc << 8) | b
            self.n += 8
        self.n -= length
        out = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return out


def _fixed_length_huffman(symbols: list[int]):
    """Canonical Huffman table with every used symbol at one length L,
    2^L ≥ n+1 (the all-ones code stays unused, as reserved by T.81).
    Returns (bits[17], huffval, {symbol: (code, L)})."""
    syms = sorted(set(symbols)) or [0]
    L = max(1, (len(syms) + 1 - 1).bit_length())
    while (1 << L) < len(syms) + 1:
        L += 1
    bits = [0] * 17
    bits[L] = len(syms)
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return bits, syms, codes


def _block_symbols(zz: np.ndarray, prev_dc: int):
    """One quantized zigzag block → (dc_symbol, dc_bits_pair,
    ac_symbol_list, new_dc). AC symbols are (run<<4)|size with ZRL/EOB."""
    diff = int(zz[0]) - prev_dc
    s, bits = _magnitude(diff)
    ac = []
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i] != 0:
            last_nz = i
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac.append((0xF0, 0, 0))  # ZRL
            run -= 16
        sz, vb = _magnitude(v)
        ac.append(((run << 4) | sz, vb, sz))
        run = 0
    if last_nz < 63:
        ac.append((0x00, 0, 0))  # EOB
    return (s, bits), ac, int(zz[0])


def encode_jpeg(img: np.ndarray, *, quality: int = 90) -> bytes:
    """HxWx3 uint8 → baseline JFIF payload (4:4:4, per-image canonical
    Huffman tables). Pure numpy; decodable by any baseline decoder."""
    h, w, _ = img.shape
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt = [np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255),
          np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)]

    ycc = _rgb_to_ycbcr(img)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1:h, :]   # edge replication
    padded[:, w:] = padded[:, w - 1:w]

    # quantized zigzag blocks, interleaved Y,Cb,Cr per MCU (4:4:4)
    blocks: list[tuple[int, np.ndarray]] = []   # (component, zz)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for c in range(3):
                blk = padded[by:by + 8, bx:bx + 8, c] - 128.0
                coef = _dct2(blk)
                zz = np.round(coef.flatten()[_ZZ]
                              / qt[0 if c == 0 else 1].flatten()[_ZZ])
                blocks.append((c, zz.astype(np.int64)))

    # two passes: collect symbols, then emit with canonical tables
    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}
    prev = [0, 0, 0]
    encoded = []
    for c, zz in blocks:
        t = 0 if c == 0 else 1
        (s, bits), ac, prev[c] = _block_symbols(zz, prev[c])
        dc_syms[t].append(s)
        ac_syms[t].extend(sym for sym, _, _ in ac)
        encoded.append((t, (s, bits), ac))
    tables = {("dc", t): _fixed_length_huffman(dc_syms[t]) for t in (0, 1)}
    tables.update(
        {("ac", t): _fixed_length_huffman(ac_syms[t]) for t in (0, 1)})

    bw = _BitWriter()
    for t, (s, bits), ac in encoded:
        code, ln = tables[("dc", t)][2][s]
        bw.write(code, ln)
        if s:
            bw.write(bits, s)
        for sym, vb, sz in ac:
            code, ln = tables[("ac", t)][2][sym]
            bw.write(code, ln)
            if sz:
                bw.write(vb, sz)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in (0, 1):
        out += seg(0xDB, bytes([tid])
                   + bytes(int(x) for x in qt[tid].flatten()[_ZZ]))
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([3,
                        1, 0x11, 0,     # Y:  1x1 sampling, qtable 0
                        2, 0x11, 1,     # Cb: 1x1, qtable 1
                        3, 0x11, 1]))   # Cr
    for (kind, t), (bits, vals, _) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        out += seg(0xC4, bytes([(tc << 4) | t]) + bytes(bits[1:17])
                   + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _build_decode_table(bits: list[int], vals: list[int]):
    """Canonical BITS/HUFFVAL → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise DecodeError("invalid Huffman code in JPEG stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF → HxWx3 uint8 (see module docstring for the declared
    envelope: SOF0, 8-bit, 4:4:4 or grayscale, no restart markers)."""
    if payload[:2] != b"\xff\xd8":
        raise DecodeError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise DecodeError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise DecodeError("truncated JPEG segment")
        if marker == 0xDB:
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise DecodeError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = np.frombuffer(body, np.uint8, 64, b + 1)
                qt[tid] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = [0] + list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                b += 17 + n
        elif marker == 0xC0:
            sof = body
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecodeError(f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:
            raise DecodeError("restart intervals unsupported")
        elif marker == 0xDA:
            ncomp = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                           body[2 + 2 * i] & 0x0F) for i in range(ncomp)]
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if sof is None or scan_comps is None:
        raise DecodeError("missing SOF0/SOS")
    if sof[0] != 8:
        raise DecodeError("only 8-bit precision supported")
    h = int.from_bytes(sof[1:3], "big")
    w = int.from_bytes(sof[3:5], "big")
    ncomp = sof[5]
    if ncomp not in (1, 3):
        raise DecodeError(f"unsupported component count {ncomp}")
    comps = []
    for i in range(ncomp):
        cid, samp, tq = sof[6 + 3 * i:9 + 3 * i]
        if samp != 0x11:
            raise DecodeError("chroma subsampling unsupported (4:4:4 only)")
        comps.append((cid, tq))
    # entropy data runs until the EOI marker (stuffed FF00 already handled)
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise DecodeError("missing EOI")
    br = _BitReader(payload[data_start:end])

    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    planes = np.zeros((ncomp, ph, pw))
    prev = [0] * ncomp
    dc_t = {cid: (0, td) for cid, td, _ in scan_comps}
    ac_t = {cid: (1, ta) for cid, _, ta in scan_comps}
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, tq) in enumerate(comps):
                if tq not in qt or dc_t[cid] not in huff \
                        or ac_t[cid] not in huff:
                    raise DecodeError("missing quant/huffman table")
                zz = np.zeros(64, dtype=np.int64)
                s = _huff_decode(br, huff[dc_t[cid]])
                prev[ci] += _extend(br.read(s), s) if s else 0
                zz[0] = prev[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, huff[ac_t[cid]])
                    if sym == 0x00:      # EOB
                        break
                    run, sz = sym >> 4, sym & 0x0F
                    if sz == 0:
                        if run != 15:
                            raise DecodeError("bad AC symbol")
                        k += 16          # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise DecodeError("AC run overflows block")
                    zz[k] = _extend(br.read(sz), sz)
                    k += 1
                coef = np.zeros(64)
                coef[_ZZ] = zz * qt[tq].flatten()[_ZZ]
                planes[ci, by:by + 8, bx:bx + 8] = \
                    _idct2(coef.reshape(8, 8)) + 128.0
    if ncomp == 1:
        y = np.clip(planes[0][:h, :w].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(
        [planes[0][:h, :w], planes[1][:h, :w], planes[2][:h, :w]],
        axis=-1))
