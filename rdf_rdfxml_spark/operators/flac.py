"""FLAC decode/encode in pure Python — the lossless audio codec real
corpora actually carry, extending the audio suite past RIFF/WAVE
(PCM/G.711/ADPCM, multimodal.py).

Scope (declared): native FLAC streams — STREAMINFO + skipped metadata
blocks, frame sync with CRC-8-checked headers and CRC-16-checked frames,
UTF-8-coded frame numbers, all four channel assignments (independent,
left/side, right/side, mid/side), subframe types CONSTANT / VERBATIM /
FIXED (orders 0-4) / LPC (any order), wasted bits, Rice/Rice2 residual
partitions including escape-coded raw partitions — plus Ogg-encapsulated
FLAC (round 5): RFC 3533 pages with the deliberately-non-zlib CRC-32,
packet continuation across pages, and the FLAC-to-Ogg mapping packet
(:func:`decode_ogg_flac` / :func:`encode_ogg_flac`).

The encoder emits VERBATIM, FIXED-predicted, or Levinson-Durbin LPC
subframes (``lpc_order`` > 0; picked per block when it beats the fixed
predictor) with Rice residuals — the residual is computed with the
EXACT integer mirror of the decoder's predictor, so any PCM input
round-trips LOSSLESSLY: ``decode(encode(x)) == x``, plus CRC/framing
checks a foreign decoder would apply. Typed-error contract as everywhere
in the multimodal suite: malformed payloads raise
:class:`~.multimodal.DecodeError`, fuzz-enforced.
"""

from __future__ import annotations

import numpy as np

from .multimodal import DecodeError

MAX_SAMPLES = 64 * 1024 * 1024  # executor-safety bound (≈4 min 48k stereo)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos          # byte position
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise DecodeError("FLAC bitstream exhausted")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= length
        out = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return out

    def read_signed(self, length: int) -> int:
        v = self.read(length)
        return v - (1 << length) if v >= (1 << (length - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise DecodeError("runaway unary code in FLAC stream")
        return q

    def align(self):
        self.acc = 0
        self.n = 0


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    ones = 0
    while ones < 8 and (first << ones) & 0x80:
        ones += 1
    if ones < 2 or ones > 7:
        raise DecodeError("bad UTF-8-coded frame number")
    val = first & (0x7F >> ones)
    for _ in range(ones - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise DecodeError("bad UTF-8-coded frame number continuation")
        val = (val << 6) | (b & 0x3F)
    return val


_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_BPS = {0: None, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list:
    method = br.read(2)
    if method > 1:
        raise DecodeError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    # Spec: blocksize must divide evenly into 2^porder partitions, and
    # each partition (blocksize >> porder) must exceed the predictor
    # order (the first partition drops `order` warmup residuals).
    psize = blocksize >> porder
    if blocksize != psize << porder or psize <= order:
        raise DecodeError("bad FLAC partition order")
    out = []
    for p in range(nparts):
        count = psize - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            out.extend(br.read_signed(raw) if raw else 0
                       for _ in range(count))
        else:
            for _ in range(count):
                q = br.unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))   # unzigzag
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise DecodeError("bad FLAC subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if eff <= 0 or eff > 33:
        raise DecodeError(f"bad FLAC effective sample size {eff}")
    if stype == 0:                      # CONSTANT
        v = br.read_signed(eff)
        s = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:                    # VERBATIM
        s = np.array([br.read_signed(eff) for _ in range(blocksize)],
                     dtype=np.int64)
    elif 8 <= stype <= 12:              # FIXED, order 0-4
        order = stype - 8
        if order > blocksize:
            raise DecodeError("FLAC predictor order exceeds blocksize")
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        s = warm + [0] * (blocksize - order)
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            s[i] = pred + resid[i - order]
        s = np.array(s, dtype=np.int64)
    elif stype >= 32:                   # LPC, order = low 5 bits + 1
        order = (stype & 0x1F) + 1
        if order > blocksize:
            raise DecodeError("FLAC LPC order exceeds blocksize")
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise DecodeError("invalid FLAC qlp precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise DecodeError("negative FLAC qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        s = warm + [0] * (blocksize - order)
        for i in range(order, blocksize):
            pred = sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
            s[i] = (pred >> shift) + resid[i - order]
        s = np.array(s, dtype=np.int64)
    else:
        raise DecodeError(f"reserved FLAC subframe type {stype}")
    return s << wasted


def decode_flac(payload: bytes):
    """FLAC → (samples int32 ndarray [n, channels], sample_rate, bps)."""
    if payload[:4] != b"fLaC":
        raise DecodeError("not a native FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise DecodeError("truncated FLAC metadata")
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + ln]
        if len(body) != ln:
            raise DecodeError("truncated FLAC metadata block")
        if btype == 0:
            if ln != 34:
                raise DecodeError("bad STREAMINFO length")
            streaminfo = body
        elif btype == 127:
            raise DecodeError("invalid FLAC metadata block type")
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise DecodeError("missing FLAC STREAMINFO")
    si = int.from_bytes(streaminfo, "big")
    # layout (from bit 271 down): see RFC 9639 §8.2
    rate = (si >> (34 * 8 - 16 - 16 - 24 - 24 - 20)) & 0xFFFFF
    channels = ((si >> (34 * 8 - 16 - 16 - 24 - 24 - 20 - 3)) & 0x7) + 1
    bps = ((si >> (34 * 8 - 16 - 16 - 24 - 24 - 20 - 3 - 5)) & 0x1F) + 1
    total = (si >> (34 * 8 - 16 - 16 - 24 - 24 - 20 - 3 - 5 - 36)) \
        & ((1 << 36) - 1)
    if rate == 0 or channels < 1 or channels > 8:
        raise DecodeError("bad STREAMINFO parameters")
    if total > MAX_SAMPLES:
        raise DecodeError(f"FLAC stream exceeds {MAX_SAMPLES} sample cap")

    out: list = []
    n_out = 0
    while pos < len(payload):
        frame_start = pos
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise DecodeError(f"bad FLAC frame sync at byte {frame_start}")
        if br.read(1):
            raise DecodeError("reserved FLAC frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise DecodeError("reserved FLAC frame bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise DecodeError("reserved FLAC blocksize code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise DecodeError("invalid FLAC sample rate code")
        fbps = _BPS.get(ss_code)
        if ss_code in (3,):
            raise DecodeError("reserved FLAC sample size code")
        if fbps is None:
            fbps = bps
        hdr_crc = br.read(8)
        if _crc8(payload[frame_start:br.pos - 1]) != hdr_crc:
            raise DecodeError("FLAC frame header CRC mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            kinds = ["indep"] * nch
        elif ch_code == 8:
            nch, kinds = 2, ["left", "side"]
        elif ch_code == 9:
            nch, kinds = 2, ["side", "right"]
        elif ch_code == 10:
            nch, kinds = 2, ["mid", "side"]
        else:
            raise DecodeError(f"reserved FLAC channel assignment {ch_code}")
        if nch != channels:
            raise DecodeError("frame channel count != STREAMINFO")
        n_out += blocksize
        if n_out > MAX_SAMPLES:
            raise DecodeError(f"FLAC stream exceeds {MAX_SAMPLES} samples")

        subs = []
        for kind in kinds:
            ch_bps = fbps + (1 if kind == "side" else 0)
            subs.append(_decode_subframe(br, blocksize, ch_bps))
        br.align()
        frame_crc = br.read(16)
        if _crc16(payload[frame_start:br.pos - 2]) != frame_crc:
            raise DecodeError("FLAC frame CRC-16 mismatch")
        pos = br.pos

        if ch_code == 8:       # left/side: R = L - side
            subs = [subs[0], subs[0] - subs[1]]
        elif ch_code == 9:     # side/right: L = R + side
            subs = [subs[1] + subs[0], subs[1]]
        elif ch_code == 10:    # mid/side
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        out.append(np.stack(subs, axis=1))
    if not out:
        raise DecodeError("FLAC stream has no frames")
    samples = np.concatenate(out, axis=0)
    if total and samples.shape[0] > total:
        samples = samples[:total]
    return samples.astype(np.int32), rate, bps


# --- encoder (verbatim / fixed + rice; lossless round-trip helper) ---------

def _encode_residual(bw: _BitWriter, resid: list):
    # single partition (porder 0), one rice parameter chosen from the mean
    bw.write(0, 2)             # method: rice, 4-bit params
    bw.write(0, 4)             # partition order 0
    mean = max(1, int(sum(abs(r) for r in resid) / max(1, len(resid))))
    param = min(14, max(0, mean.bit_length()))
    bw.write(param, 4)
    for r in resid:
        v = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        q, rem = v >> param, v & ((1 << param) - 1)
        if q > 1 << 20:
            raise DecodeError("rice parameter blow-up (encoder)")
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if param:
            bw.write(rem, param)


def _lpc_estimate(s: list, order: int):
    """Levinson–Durbin LPC estimation → (quantized coefs, shift) or None
    when the block is degenerate (constant / too short / unstable).
    Prediction form matches the decoder exactly:
    ``pred = (Σ c_j · s[i-1-j]) >> shift``."""
    n = len(s)
    if n <= order * 2:
        return None
    x = np.asarray(s, dtype=np.float64)
    r = [float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)]
    if r[0] == 0.0:
        return None
    err = r[0]
    a = np.zeros(order + 1)
    for i in range(1, order + 1):
        acc = r[i] - float(np.dot(a[1:i], r[i - 1:0:-1]))
        k = acc / err
        a[1:i + 1] = np.concatenate([a[1:i] - k * a[1:i][::-1],
                                     np.array([k])])
        err *= (1 - k * k)
        if err <= 0:
            return None
    coefs = a[1:order + 1]                # s[i] ≈ Σ coefs[j] s[i-1-j]
    cmax = float(np.abs(coefs).max())
    if not np.isfinite(cmax) or cmax == 0:
        return None
    precision = 14                        # < 15 (qlp precision limit)
    shift = min(15, max(1, precision - 1 - int(np.ceil(np.log2(cmax + 1e-9)))
                        if cmax >= 1 else precision - 1))
    q = [int(round(c * (1 << shift))) for c in coefs]
    lim = 1 << (precision - 1)
    q = [max(-lim, min(lim - 1, c)) for c in q]
    if not any(q):
        return None
    return q, shift, precision


def _encode_subframe(bw: _BitWriter, s: np.ndarray, bps: int,
                     fixed_order: int, lpc_order: int = 0):
    s = [int(x) for x in s]
    bw.write(0, 1)
    if len(set(s)) == 1 and fixed_order >= 0:
        bw.write(0, 6)                       # CONSTANT
        bw.write(0, 1)
        bw.write(s[0] & ((1 << bps) - 1), bps)
        return
    if fixed_order < 0:
        bw.write(1, 6)                       # VERBATIM
        bw.write(0, 1)
        for v in s:
            bw.write(v & ((1 << bps) - 1), bps)
        return
    order = min(fixed_order, len(s))
    coefs = _FIXED_COEFS[order]
    fixed_resid = [s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
                   for i in range(order, len(s))]
    choice = ("fixed", order, None, 0, fixed_resid)
    if lpc_order > 0:
        est = _lpc_estimate(s, min(lpc_order, 32, max(1, len(s) // 4)))
        if est is not None:
            q, shift, prec = est
            o = len(q)
            # EXACT integer mirror of the decoder's predictor
            resid = [s[i] - (sum(q[j] * s[i - 1 - j] for j in range(o))
                             >> shift)
                     for i in range(o, len(s))]
            cost_lpc = sum(abs(r) for r in resid) + o * 4
            cost_fix = sum(abs(r) for r in fixed_resid)
            if cost_lpc < cost_fix:
                choice = ("lpc", o, q, shift, resid)
    kind, order, q, shift, resid = choice
    if kind == "fixed":
        bw.write(8 + order, 6)               # FIXED
        bw.write(0, 1)                       # no wasted bits
        for v in s[:order]:
            bw.write(v & ((1 << bps) - 1), bps)
    else:
        bw.write(0x20 | (order - 1), 6)      # LPC
        bw.write(0, 1)
        for v in s[:order]:
            bw.write(v & ((1 << bps) - 1), bps)
        bw.write(14 - 1, 4)                  # qlp precision 14
        bw.write(shift & 0x1F, 5)
        for c in q:
            bw.write(c & 0x3FFF, 14)
    _encode_residual(bw, resid)


def encode_flac(samples: np.ndarray, rate: int, *, bps: int = 16,
                blocksize: int = 1024, fixed_order: int = 2,
                lpc_order: int = 0) -> bytes:
    """(n, channels) int → native FLAC payload (independent channels;
    FIXED predictors with Rice residuals, Levinson-Durbin LPC when
    ``lpc_order`` > 0 beats the fixed predictor, or VERBATIM when
    ``fixed_order`` < 0). Lossless by construction — the residual is the
    exact integer mirror of the decoder's predictor — which is the
    round-trip test contract."""
    header, frames = _encode_flac_parts(samples, rate, bps=bps,
                                        blocksize=blocksize,
                                        fixed_order=fixed_order,
                                        lpc_order=lpc_order)
    return header + b"".join(frames)


def _encode_flac_parts(samples: np.ndarray, rate: int, *, bps: int = 16,
                       blocksize: int = 1024, fixed_order: int = 2,
                       lpc_order: int = 0) -> tuple:
    """encode_flac split at the container seam: returns
    ``(header_bytes, [frame_bytes, ...])`` — the native stream is their
    concatenation; the Ogg mapping needs the frames individually (one
    audio packet per frame)."""
    if samples.ndim != 2:
        raise ValueError("samples must be (n, channels)")
    n, channels = samples.shape
    out = bytearray(b"fLaC")
    si = 0
    si = (si << 16) | blocksize
    si = (si << 16) | blocksize
    si = (si << 24) | 0
    si = (si << 24) | 0
    si = (si << 20) | rate
    si = (si << 3) | (channels - 1)
    si = (si << 5) | (bps - 1)
    si = (si << 36) | n
    si <<= 128                                 # md5 unset
    out += bytes([0x80, 0, 0, 34]) + si.to_bytes(34, "big")

    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bps)
    if ss_code is None:
        raise ValueError(f"unsupported bps {bps}")
    frames = []
    for fi, start in enumerate(range(0, n, blocksize)):
        blk = samples[start:start + blocksize]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)                 # fixed blocksize strategy
        bw.write(7, 4)                 # blocksize: 16-bit at end - 1
        bw.write(0, 4)                 # rate: from STREAMINFO
        bw.write(channels - 1, 4)      # independent channels
        bw.write(ss_code, 3)
        bw.write(0, 1)
        # UTF-8-coded frame number (supports up to 2^31 frames)
        fn = fi
        if fn < 0x80:
            bw.write(fn, 8)
        else:
            # Peel 6-bit continuation chunks until the residue fits the
            # lead byte, which holds 7-ones value bits for an ones-byte
            # sequence (<= keeps the encoding minimal: 0x7F>>(len+1) is
            # exactly the lead-byte capacity once this chunk is added).
            chunks = []
            while True:
                chunks.append(0x80 | (fn & 0x3F))
                fn >>= 6
                if fn <= (0x7F >> (len(chunks) + 1)):
                    break
            ones = len(chunks) + 1
            bw.write((0xFF << (8 - ones)) & 0xFF | fn, 8)
            for c in reversed(chunks):
                bw.write(c, 8)
        bw.write(len(blk) - 1, 16)
        bw.align()
        hdr = bytes(bw.out)
        bw.write(_crc8(hdr), 8)
        for c in range(channels):
            _encode_subframe(bw, blk[:, c], bps, fixed_order, lpc_order)
        bw.align()
        body = bytes(bw.out)
        bw.write(_crc16(body), 16)
        frames.append(bytes(bw.out))
    return bytes(out), frames


# --- Ogg encapsulation (RFC 3533 pages + the FLAC-to-Ogg mapping) --------

_OGG_CRC_TABLE = []


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: polynomial 0x04C11DB7, MSB-first, init 0,
    no final xor (RFC 3533 §6 — deliberately NOT the zlib crc32)."""
    if not _OGG_CRC_TABLE:
        for b in range(256):
            r = b << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                    else (r << 1) & 0xFFFFFFFF
            _OGG_CRC_TABLE.append(r)
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ byte]
    return crc


def _ogg_page(serial: int, seq: int, granule: int, header_type: int,
              lacing: list, body: bytes) -> bytes:
    hdr = bytearray(b"OggS")
    hdr += bytes([0, header_type])
    hdr += (granule & ((1 << 64) - 1)).to_bytes(8, "little")
    hdr += serial.to_bytes(4, "little")
    hdr += seq.to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"                 # CRC placeholder
    hdr += bytes([len(lacing)]) + bytes(lacing)
    page = bytes(hdr) + body
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def encode_ogg_flac(samples: np.ndarray, rate: int, *,
                    max_segs_per_page: int = 255, **kw) -> bytes:
    """(n, channels) int → Ogg-encapsulated FLAC (the FLAC-to-Ogg
    mapping): BOS page carrying the 0x7F"FLAC" mapping header + fLaC +
    STREAMINFO as its only packet, then one audio packet per FLAC frame,
    packed into CRC'd pages. ``max_segs_per_page`` below 255 forces
    packets to span pages (continued-packet flag) — the demux path a
    real many-frame stream exercises."""
    header, frames = _encode_flac_parts(samples, rate, **kw)
    streaminfo_block = header[4:]               # 4-byte block hdr + 34
    first = (bytes([0x7F]) + b"FLAC" + bytes([1, 0])
             + (0).to_bytes(2, "big") + b"fLaC" + streaminfo_block)
    out = bytearray()
    out += _ogg_page(0x464C4143, 0, 0, 0x02,
                     _lacing_for(len(first)), first)
    seq = 1
    blocksize = kw.get("blocksize", 1024)
    pend_lace: list = []
    pend_body = bytearray()
    pend_granule = 0
    pend_continued = False

    def flush(eos: bool, continued_out: bool):
        nonlocal out, seq, pend_lace, pend_body, pend_continued
        ht = (0x01 if pend_continued else 0) | (0x04 if eos else 0)
        # a page whose last packet continues elsewhere reports granule -1
        gran = pend_granule if not continued_out else (1 << 64) - 1
        out += _ogg_page(0x464C4143, seq, gran, ht, pend_lace,
                         bytes(pend_body))
        seq += 1
        pend_lace, pend_body = [], bytearray()
        pend_continued = continued_out

    n = samples.shape[0]
    for fi, frame in enumerate(frames):
        lace = _lacing_for(len(frame))
        pos = 0
        while lace:
            room = max_segs_per_page - len(pend_lace)
            take = lace[:room]
            nbytes = sum(take)
            pend_lace += take
            pend_body += frame[pos:pos + nbytes]
            pos += nbytes
            lace = lace[room:]
            if lace:                    # packet continues on a new page
                flush(False, True)
        pend_granule = min((fi + 1) * blocksize, n)
        if len(pend_lace) >= max_segs_per_page:
            flush(fi == len(frames) - 1, False)
    if pend_lace or not frames:
        pend_granule = n
        flush(True, False)
    return bytes(out)


def _lacing_for(nbytes: int) -> list:
    lace = [255] * (nbytes // 255) + [nbytes % 255]
    return lace                          # trailing 0 terminates ×255 runs


def _ogg_packets(payload: bytes):
    """Ogg demux: yield complete logical packets (CRC-checked pages,
    continuation handled). Typed DecodeError on any malformation."""
    pos = 0
    partial = bytearray()
    expect_seq = None
    while pos < len(payload):
        if payload[pos:pos + 4] != b"OggS":
            raise DecodeError("bad Ogg capture pattern")
        if pos + 27 > len(payload):
            raise DecodeError("truncated Ogg page header")
        if payload[pos + 4] != 0:
            raise DecodeError("unsupported Ogg version")
        header_type = payload[pos + 5]
        seq = int.from_bytes(payload[pos + 18:pos + 22], "little")
        crc = int.from_bytes(payload[pos + 22:pos + 26], "little")
        nsegs = payload[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > len(payload):
            raise DecodeError("truncated Ogg lacing table")
        lacing = payload[pos + 27:lace_end]
        body_len = sum(lacing)
        page_end = lace_end + body_len
        if page_end > len(payload):
            raise DecodeError("truncated Ogg page body")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise DecodeError("Ogg page CRC mismatch")
        if expect_seq is not None and seq != expect_seq:
            raise DecodeError("Ogg page sequence gap")
        expect_seq = seq + 1
        if partial and not header_type & 0x01:
            raise DecodeError("Ogg continued packet dropped")
        if not partial and header_type & 0x01:
            raise DecodeError("unexpected Ogg continuation flag")
        body_pos = lace_end
        for i, lv in enumerate(lacing):
            partial += payload[body_pos:body_pos + lv]
            body_pos += lv
            if lv < 255:
                yield bytes(partial)
                partial = bytearray()
        pos = page_end
    if partial:
        raise DecodeError("Ogg stream ends mid-packet")


def decode_ogg_flac(payload: bytes):
    """Ogg-FLAC → (samples, rate, bps): demux the pages, rebuild the
    native stream (fLaC + STREAMINFO with the last-metadata flag forced
    + the audio-packet frames, skipping any extra header packets), then
    reuse :func:`decode_flac`."""
    packets = _ogg_packets(payload)
    try:
        first = next(packets)
    except StopIteration:
        raise DecodeError("empty Ogg stream") from None
    if len(first) < 51 or first[0] != 0x7F or first[1:5] != b"FLAC":
        raise DecodeError("not an Ogg-FLAC mapping packet")
    if first[5] != 1:                           # major version
        raise DecodeError("unsupported Ogg-FLAC mapping version")
    n_headers = int.from_bytes(first[7:9], "big")
    if first[9:13] != b"fLaC":
        raise DecodeError("Ogg-FLAC first packet missing fLaC")
    streaminfo_block = bytearray(first[13:])
    streaminfo_block[0] |= 0x80                 # force last-metadata
    native = bytearray(b"fLaC") + streaminfo_block
    for _ in range(n_headers):                  # skip extra header pkts
        try:
            next(packets)
        except StopIteration:
            raise DecodeError("missing Ogg-FLAC header packets") from None
    for frame in packets:
        native += frame
    return decode_flac(bytes(native))
