"""WebP lossless (VP8L) decode/encode in pure Python — the modern
real-corpus image format the round-4 codec seam named first
(multimodal.py previously raised ``NotImplementedError`` on RIFF/WEBP).

Scope (declared): the LOSSLESS bitstream ("VP8L" chunk) — LSB-first bit
stream, canonical-Huffman symbol coding with both the simple and
code-length-coded tree forms (incl. 16/17/18 repeats and the max_symbol
shortcut), color cache, meta-Huffman (per-block entropy-group
selection), LZ77 backward references, and all four transforms
(PREDICTOR with all 14 modes, cross-color COLOR, SUBTRACT_GREEN,
COLOR_INDEXING incl. sub-byte pixel packing for small palettes), plus
the RIFF container walk — including VP8X extended-container STILLS
(metadata chunks skipped, the VP8L chunk inside decodes). LOSSY VP8
intra-only stills decode too since round 6 — the RIFF walk dispatches
"VP8 " chunks to operators/vp8.py (boolean arithmetic decoder, intra
prediction, token decoding, loop filters; see that module's
reconstructed-probability-table caveat). ANIMATION (ANMF) decodes too
since round 6: `decode_webp_anim` composites frames (2x offsets,
dispose-to-background, ANIM background color) with an encoder twin
(`encode_webp_anim`), and BLENDING is real per-pixel alpha blending —
ALPH sub-chunks decode (raw + headerless-VP8L compression, all four
alpha filters, encoder twin `encode_alph`) for lossy frames, and
lossless frames blend via their VP8L A channel; the composited OUTPUT
drops alpha per the suite convention. Inter-coded VP8 frames stay the
typed-error seam.

One offline caveat, stated rather than hidden: the 2-D near-distance
table (LZ77 distance codes 1..120) is reconstructed from its definition
(the 120 (dx, dy) neighbors with |dx| <= 8, 0 <= dy <= 7 ordered by
ascending dx² + dy², ties by ascending |dx| with positive dx first —
the ordering every recalled span of the spec table follows, pinned by
tests/test_webp.py's structural test), but it could not be
byte-compared to the published table in this sandbox. Since round 6 the
encoder can EMIT near codes too (``near_distances=True``: row-above
copies through the (0,1)/(1,1) offsets), so the table is round-trip-
pinned in BOTH directions (offset → code at encode, code → offset at
decode); a residual deviation from the published table would only
surface on external files whose encoder ordered a distance tie
differently, and the table is a 120-line drop-in to fix.

The encoder emits a spec-valid subset used by the tests and synth
corpus: all four transforms are emittable (SUBTRACT_GREEN, whole-image
PREDICTOR and cross-color COLOR, COLOR_INDEXING palette with pixel
packing), fixed complete
Huffman code sets written through the code-length code, run-length LZ77
(distance 1) so the copy path round-trips, and 1-symbol simple trees
where a channel is constant. ``decode(encode(img)) == img`` exactly.

Typed-error contract as everywhere in the multimodal suite: malformed
payloads raise :class:`~.multimodal.DecodeError`.
"""

from __future__ import annotations

import numpy as np

from .multimodal import DecodeError

MAX_PIXELS = 64 * 1024 * 1024  # executor-safety bound

_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
                      12, 13, 14, 15]


def _near_distance_table():
    """Reconstructed 2-D near-distance neighborhood (see module
    docstring caveat): 120 (dx, dy) offsets, dy 0..7, |dx| <= 8,
    (dy > 0 or dx > 0), ordered by ascending dx² + dy², ties by
    ascending |dx| with positive dx before negative — the ordering the
    spec table's visible structure follows ({1,1} before {-1,1};
    {0,5},{3,4},{-3,4},{4,3},{-4,3},{5,0} within d²=25)."""
    cand = []
    for dy in range(8):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx * dx + dy * dy, max(dx, -dx), dx < 0, dx, dy))
    cand.sort()
    return [(dx, dy) for _, _, _, dx, dy in cand[:120]]


_NEAR_DIST = _near_distance_table()


class _LBitReader:
    """LSB-first bit reader (VP8L convention — opposite of FLAC/JPEG)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise DecodeError("VP8L bitstream exhausted")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        out = self.acc & ((1 << length) - 1)
        self.acc >>= length
        self.n -= length
        return out


class _LBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int):
        self.acc |= (value & ((1 << length) - 1)) << self.n
        self.n += length
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.out)


class _Huffman:
    """Canonical Huffman decoder: codes assigned DEFLATE-style from a
    length assignment; bits arrive one at a time, first-read bit is the
    code's most significant."""

    __slots__ = ("table", "single", "maxlen")

    def __init__(self, lengths: list):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise DecodeError("empty VP8L huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.maxlen = 0
            return
        self.single = None
        kraft = sum(1 / (1 << ln) for ln, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise DecodeError("incomplete/oversubscribed VP8L code")
        nz.sort()
        table = {}
        code = 0
        prev_len = nz[0][0]
        for ln, sym in nz:
            code <<= (ln - prev_len)
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        self.table = table
        self.maxlen = nz[-1][0]

    def read(self, br: _LBitReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        for ln in range(1, self.maxlen + 1):
            acc = (acc << 1) | br.read(1)
            sym = self.table.get((ln, acc))
            if sym is not None:
                return sym
        raise DecodeError("invalid VP8L huffman code")


def _canonical_codes(lengths: list) -> dict:
    """Encoder twin of :class:`_Huffman`: symbol → (code, length).
    The code value is BIT-REVERSED for the LSB-first writer — the
    decoder consumes the canonical code MSB-first, and the stream
    delivers bits low-bit-first, so the writer must push the code's
    most significant bit earliest."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code = 0
    prev_len = nz[0][0] if nz else 0
    for ln, sym in nz:
        code <<= (ln - prev_len)
        prev_len = ln
        rev = 0
        for i in range(ln):
            rev |= ((code >> i) & 1) << (ln - 1 - i)
        codes[sym] = (rev, ln)
        code += 1
    return codes


def _read_huffman_code(br: _LBitReader, alphabet_size: int) -> _Huffman:
    if br.read(1):                           # simple code
        n_syms = br.read(1) + 1
        if br.read(1):                       # first symbol is 8-bit
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet_size
        if n_syms == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise DecodeError("VP8L simple-code symbol out of range")
            if sym0 == sym1:
                raise DecodeError("VP8L simple-code duplicate symbol")
            lengths[sym0] = lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise DecodeError("VP8L simple-code symbol out of range")
            lengths[sym0] = 1
            h = _Huffman.__new__(_Huffman)
            h.single, h.table, h.maxlen = sym0, None, 0
            return h
        return _Huffman(lengths)
    n_codes = 4 + br.read(4)
    if n_codes > len(_CODE_LENGTH_ORDER):
        raise DecodeError("bad VP8L code-length count")
    cl_lengths = [0] * len(_CODE_LENGTH_ORDER)
    for i in range(n_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_tree = _Huffman(cl_lengths)
    if br.read(1):                           # max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym >= alphabet_size:
                    raise DecodeError("VP8L repeat overruns alphabet")
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:                                # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise DecodeError("VP8L zero-run overruns alphabet")
    return _Huffman(lengths)


def _prefix_decode(br: _LBitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec prefix coding)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """value (>=1) → (code, extra_bits, extra_value)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, extra, v & ((1 << extra) - 1)


_GREEN_EXTRA = 24                            # length prefix codes
_DIST_ALPHABET = 40


def _decode_entropy_image(br: _LBitReader, w: int, h: int,
                          level0: bool = False):
    """One VP8L entropy-coded ARGB image → uint32 array (h, w) of
    0xAARRGGBB. ``level0`` enables the meta-Huffman read (transforms are
    handled by the caller)."""
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise DecodeError("bad VP8L subimage dimensions")
    cache_bits = 0
    if br.read(1):                           # color cache (before meta)
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise DecodeError("bad VP8L color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):                # meta huffman present
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh)
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1
    green_size = 256 + _GREEN_EXTRA + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_huffman_code(br, green_size)
        r = _read_huffman_code(br, 256)
        b = _read_huffman_code(br, 256)
        a = _read_huffman_code(br, 256)
        d = _read_huffman_code(br, _DIST_ALPHABET)
        groups.append((g, r, b, a, d))
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    npix = w * h
    while pos < npix:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            group = groups[(gi >> 8) & 0xFFFF]
        else:
            group = groups[0]
        gt, rt, bt, at, dt = group
        s = gt.read(br)
        if s < 256:
            red = rt.read(br)
            blue = bt.read(br)
            alpha = at.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] \
                    = px
        elif s < 256 + _GREEN_EXTRA:
            length = _prefix_decode(br, s - 256)
            dist_code = _prefix_decode(br, dt.read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _NEAR_DIST[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > npix:
                raise DecodeError("VP8L backward reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
        else:
            if cache is None:
                raise DecodeError("VP8L cache symbol without cache")
            idx = s - 256 - _GREEN_EXTRA
            if idx >= len(cache):
                raise DecodeError("VP8L cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(h, w)


# --- inverse transforms ---------------------------------------------------

def _avg2(a, b):
    return ((a.astype(np.uint16) + b.astype(np.uint16)) >> 1).astype(
        np.uint8)


_PRED_BLACK = np.array([255, 0, 0, 0], dtype=np.uint8)


def _pred_value(ch: np.ndarray, y: int, x: int, mode: int,
                w: int) -> np.ndarray:
    """Prediction for pixel (y, x) from the RECONSTRUCTED neighborhood
    ``ch`` (h, w, 4 uint8 A,R,G,B) — shared by the decoder's inverse
    and the encoder's forward pass so the two cannot drift. Edge rules:
    [0,0] → opaque black, row 0 → L, column 0 → T; top-right at the
    last column reads the buffer successor, i.e. the CURRENT row's
    first pixel (already reconstructed — the contiguous-buffer
    semantics libwebp uses)."""
    if x == 0 and y == 0:
        return _PRED_BLACK
    if y == 0:
        return ch[0, x - 1]
    if x == 0:
        return ch[y - 1, 0]
    left = ch[y, x - 1]
    top = ch[y - 1, x]
    tl = ch[y - 1, x - 1]
    tr = ch[y - 1, x + 1] if x + 1 < w else ch[y, 0]
    if mode == 0:
        return _PRED_BLACK
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        p = left.astype(np.int16) + top.astype(np.int16) \
            - tl.astype(np.int16)
        pl = int(np.abs(p - left.astype(np.int16)).sum())
        pt = int(np.abs(p - top.astype(np.int16)).sum())
        # Spec Select(): `if (pL < pT) return L; else return T` — an
        # exact Manhattan-distance tie returns TOP, not LEFT.
        return left if pl < pt else top
    if mode == 12:
        return np.clip(left.astype(np.int16) + top.astype(np.int16)
                       - tl.astype(np.int16), 0, 255).astype(np.uint8)
    if mode == 13:
        # ClampAddSubtractHalf: C `(a - tl) / 2` truncates toward zero;
        # Python // floors — they differ by 1 for negative odd deltas.
        a_ = _avg2(left, top).astype(np.int16)
        d = a_ - tl.astype(np.int16)
        half = np.where(d >= 0, d >> 1, -((-d) >> 1)).astype(np.int16)
        return np.clip(a_ + half, 0, 255).astype(np.uint8)
    raise DecodeError(f"bad VP8L predictor mode {mode}")


def _argb_to_channels(argb: np.ndarray) -> np.ndarray:
    h, w = argb.shape
    ch = np.zeros((h, w, 4), dtype=np.uint8)           # A,R,G,B
    ch[..., 0] = (argb >> 24) & 0xFF
    ch[..., 1] = (argb >> 16) & 0xFF
    ch[..., 2] = (argb >> 8) & 0xFF
    ch[..., 3] = argb & 0xFF
    return ch


def _channels_to_argb(ch: np.ndarray) -> np.ndarray:
    return ((ch[..., 0].astype(np.uint32) << 24)
            | (ch[..., 1].astype(np.uint32) << 16)
            | (ch[..., 2].astype(np.uint32) << 8)
            | ch[..., 3].astype(np.uint32))


def _inv_predictor(argb: np.ndarray, modes: np.ndarray,
                   bits: int) -> np.ndarray:
    """Inverse PREDICTOR transform: residual += prediction, per channel
    mod 256. Scalar loop — clarity over speed (bench images are small;
    the UDF isolates per item)."""
    h, w = argb.shape
    ch = _argb_to_channels(argb)
    for y in range(h):
        for x in range(w):
            mode = int(modes[y >> bits, x >> bits])
            pred = _pred_value(ch, y, x, mode, w)
            ch[y, x] = ch[y, x] + pred                  # uint8 wraps
    return _channels_to_argb(ch)


def _delta(t, c):
    """Cross-color delta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(argb: np.ndarray, elems: np.ndarray,
                         bits: int) -> np.ndarray:
    h, w = argb.shape
    out = argb.copy()
    for y in range(h):
        for x in range(w):
            e = int(elems[y >> bits, x >> bits])
            g2r = e & 0xFF                   # blue channel of element
            g2b = (e >> 8) & 0xFF            # green channel
            r2b = (e >> 16) & 0xFF           # red channel
            px = int(out[y, x])
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _delta(g2r, g)) & 0xFF
            b = (b + _delta(g2b, g) + _delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (r << 16) | (g << 8) | b


def decode_vp8l(data: bytes):
    """VP8L chunk payload → (h, w) uint32 ARGB array."""
    if not data or data[0] != 0x2F:
        raise DecodeError("bad VP8L signature")
    br = _LBitReader(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                               # alpha hint
    if br.read(3) != 0:
        raise DecodeError("unsupported VP8L version")
    if w * h > MAX_PIXELS:
        raise DecodeError("VP8L image exceeds pixel cap")
    return _decode_vp8l_stream(br, w, h)


def _decode_vp8l_stream(br: _LBitReader, w: int, h: int):
    """Transform list + entropy image for KNOWN dims — shared by the
    headed VP8L chunk and the HEADERLESS ALPH lossless mode (the ALPH
    sub-chunk omits signature/dims; they come from the frame)."""
    transforms = []                          # applied inverse, LIFO
    seen = set()
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise DecodeError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:                       # PREDICTOR
            bits = br.read(3) + 2
            mw = (cur_w + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            modes = (_decode_entropy_image(br, mw, mh) >> 8) & 0xFF
            transforms.append(("predictor", bits, modes))
        elif ttype == 1:                     # COLOR
            bits = br.read(3) + 2
            mw = (cur_w + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            elems = _decode_entropy_image(br, mw, mh) & 0xFFFFFF
            transforms.append(("color", bits, elems))
        elif ttype == 2:                     # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:                                # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal_img = np.ascontiguousarray(
                _decode_entropy_image(br, n_colors, 1)[0])
            # palette entries are delta-coded per CHANNEL: cumulative
            # sum componentwise, mod 256
            raw = pal_img.view(np.uint8).reshape(-1, 4).astype(np.uint32)
            cum = np.cumsum(raw, axis=0).astype(np.uint8)
            pal = np.ascontiguousarray(cum).view(np.uint32).reshape(-1)
            width_bits = (3 if n_colors <= 2 else
                          2 if n_colors <= 4 else
                          1 if n_colors <= 16 else 0)
            transforms.append(("palette", width_bits, pal, cur_w))
            cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits
    argb = _decode_entropy_image(br, cur_w, h, level0=True)
    for t in reversed(transforms):
        if t[0] == "palette":
            _, wb, pal, full_w = t
            if wb:
                ipp = 1 << wb                # indices per packed pixel
                ibits = 8 >> wb
                idx = (argb >> 8) & 0xFF
                unpacked = np.zeros((h, full_w), dtype=np.uint32)
                for x in range(full_w):
                    packed = idx[:, x >> wb]
                    shift = (x % ipp) * ibits
                    unpacked[:, x] = (packed >> shift) & ((1 << ibits) - 1)
                indices = unpacked
            else:
                indices = (argb >> 8) & 0xFF
            if int(indices.max(initial=0)) >= len(pal):
                raise DecodeError("VP8L palette index out of range")
            argb = pal[indices.astype(np.intp)].astype(np.uint32)
        elif t[0] == "subtract_green":
            argb = _inv_subtract_green(argb)
        elif t[0] == "color":
            argb = _inv_color_transform(argb, t[2], t[1])
        else:
            argb = _inv_predictor(argb, t[2], t[1])
    if argb.shape != (h, w):
        raise DecodeError("VP8L transform size mismatch")
    return argb


def decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk → (h, w) uint8 alpha plane (round 6). Header byte:
    rsv(2) | preprocessing(2) | filtering(2) | compression(2), MSB
    first. Compression 0 = raw w*h bytes; 1 = a HEADERLESS VP8L stream
    of the frame's dims carrying alpha in the GREEN channel. Filters
    (applied post-decompression, per §alpha filtering): 0 none,
    1 horizontal (pred = left), 2 vertical (pred = above), 3 gradient
    (pred = clip(left + above - above-left)). Edge rules per the
    container spec: only (0,0) predicts from 0; the horizontal filter
    predicts (0, y>0) from the pixel ABOVE, the vertical filter
    predicts (x>0, 0) from the pixel to the LEFT, and the gradient
    filter degenerates to those same rules on the edges (missing
    neighbors read as 0 only via the clip identity). Preprocessing
    (level reduction) is encoder-side lossy — nothing to undo."""
    if not body:
        raise DecodeError("empty ALPH chunk")
    hdr = body[0]
    filt = (hdr >> 2) & 3
    compression = hdr & 3
    if compression == 0:
        if len(body) - 1 < w * h:
            raise DecodeError("raw ALPH plane truncated")
        a = np.frombuffer(body[1:1 + w * h],
                          dtype=np.uint8).reshape(h, w).copy()
    elif compression == 1:
        argb = _decode_vp8l_stream(_LBitReader(body, 1), w, h)
        a = ((argb >> 8) & 0xFF).astype(np.uint8)
    else:
        raise DecodeError(f"reserved ALPH compression {compression}")
    if filt:
        out = a.astype(np.int32)
        for y in range(h):
            for x in range(w):
                left = out[y, x - 1] if x else 0
                up = out[y - 1, x] if y else 0
                ul = out[y - 1, x - 1] if (x and y) else 0
                if filt == 1:                # horizontal: left, but the
                    if x == 0 and y > 0:     # row-start predicts ABOVE
                        pred = out[y - 1, 0]
                    else:
                        pred = left
                elif filt == 2:              # vertical: above, but the
                    if y == 0 and x > 0:     # top row predicts LEFT
                        pred = out[0, x - 1]
                    else:
                        pred = up
                else:
                    pred = min(255, max(0, left + up - ul))
                out[y, x] = (out[y, x] + pred) & 0xFF
        a = out.astype(np.uint8)
    return a


def encode_alph(alpha: np.ndarray, *, filt: int = 0) -> bytes:
    """Alpha plane → ALPH chunk body (raw compression, optional
    filter — the encoder subtracts the same predictor the decoder
    adds)."""
    h, w = alpha.shape
    if filt:
        src = alpha.astype(np.int32)
        res = np.zeros_like(src)
        for y in range(h):
            for x in range(w):
                left = src[y, x - 1] if x else 0
                up = src[y - 1, x] if y else 0
                ul = src[y - 1, x - 1] if (x and y) else 0
                if filt == 1:                # mirror decode_alph's spec
                    if x == 0 and y > 0:     # edge rules exactly
                        pred = src[y - 1, 0]
                    else:
                        pred = left
                elif filt == 2:
                    if y == 0 and x > 0:
                        pred = src[0, x - 1]
                    else:
                        pred = up
                else:
                    pred = min(255, max(0, left + up - ul))
                res[y, x] = (src[y, x] - pred) & 0xFF
        plane = res.astype(np.uint8)
    else:
        plane = alpha
    return bytes([(filt & 3) << 2]) + plane.tobytes()


def _decode_still_chunk(fourcc: bytes, body: bytes) -> np.ndarray:
    if fourcc == b"VP8L":
        argb = decode_vp8l(body)
        rgb = np.zeros((*argb.shape, 3), dtype=np.uint8)
        rgb[..., 0] = (argb >> 16) & 0xFF
        rgb[..., 1] = (argb >> 8) & 0xFF
        rgb[..., 2] = argb & 0xFF
        return rgb
    from .vp8 import decode_vp8
    return decode_vp8(body)


def _decode_still_rgba(fourcc: bytes, body: bytes,
                       alph: bytes | None) -> tuple:
    """(rgb, alpha-or-None): VP8L carries alpha in its A channel (a
    present ALPH chunk is ignored per spec for lossless frames); lossy
    VP8 takes alpha from the ALPH sub-chunk when present."""
    if fourcc == b"VP8L":
        argb = decode_vp8l(body)
        rgb = np.zeros((*argb.shape, 3), dtype=np.uint8)
        rgb[..., 0] = (argb >> 16) & 0xFF
        rgb[..., 1] = (argb >> 8) & 0xFF
        rgb[..., 2] = argb & 0xFF
        a = ((argb >> 24) & 0xFF).astype(np.uint8)
        return rgb, (None if (a == 255).all() else a)
    from .vp8 import decode_vp8
    rgb = decode_vp8(body)
    if alph is not None:
        return rgb, decode_alph(alph, rgb.shape[1], rgb.shape[0])
    return rgb, None


def _riff_chunks(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise DecodeError("not a WebP payload")
    riff_len = int.from_bytes(payload[4:8], "little")
    if riff_len + 8 > len(payload) + 1:      # +1: odd-length pad slack
        raise DecodeError("truncated WebP RIFF")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise DecodeError("truncated WebP chunk")
        yield fourcc, body
        pos += 8 + ln + (ln & 1)


def decode_webp_anim(payload: bytes, *, max_frames: int = 256) -> list:
    """Animated WebP (VP8X + ANIM + ANMF, round 6) → list of composited
    full-canvas HxWx3 uint8 frames. Frame sub-payloads are VP8L or
    lossy VP8 stills; since commit 796b24b ALPH sub-chunks are DECODED
    (raw + headerless-VP8L, all four alpha filters) and VP8L's own A
    channel is honored, so a clear blend bit performs real per-pixel
    alpha blending onto the canvas (no_blend = overwrite). Placement
    honors the 2x frame offsets, and the dispose-to-background bit
    fills the frame's rect with the ANIM background color's RGB before
    the NEXT frame renders. The composited OUTPUT frames stay HxWx3
    (the suite's RGB convention — canvas alpha is not tracked)."""
    canvas = None
    bg = (255, 255, 255)
    frames = []
    for fourcc, body in _riff_chunks(payload):
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise DecodeError("short VP8X chunk")
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
            if cw * ch > MAX_PIXELS:
                raise DecodeError("WebP canvas too large")
            canvas = np.zeros((ch, cw, 3), dtype=np.uint8)
        elif fourcc == b"ANIM":
            if len(body) < 6:
                raise DecodeError("short ANIM chunk")
            # background is BGRA; keep RGB
            bg = (body[2], body[1], body[0])
            if canvas is not None:
                canvas[:] = bg
        elif fourcc == b"ANMF":
            if canvas is None:
                raise DecodeError("ANMF before VP8X canvas")
            if len(frames) >= max_frames:
                raise DecodeError("too many animation frames (bound)")
            if len(body) < 16:
                raise DecodeError("short ANMF chunk")
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            flags = body[15]
            dispose_bg = flags & 1
            no_blend = (flags >> 1) & 1
            img = alpha = None
            alph_body = None
            for sub_cc, sub_body in _riff_chunks(
                    b"RIFF" + (len(body) - 16 + 4).to_bytes(4, "little")
                    + b"WEBP" + body[16:]):
                if sub_cc == b"ALPH":
                    alph_body = sub_body
                elif sub_cc in (b"VP8L", b"VP8 "):
                    img, alpha = _decode_still_rgba(sub_cc, sub_body,
                                                    alph_body)
                    break
            if img is None:
                raise DecodeError("ANMF frame carries no image chunk")
            if img.shape[0] != fh or img.shape[1] != fw:
                raise DecodeError("ANMF frame size mismatch")
            if fy + fh > canvas.shape[0] or fx + fw > canvas.shape[1]:
                raise DecodeError("ANMF frame exceeds canvas")
            if alpha is not None and not no_blend:
                # per-pixel alpha blend onto the canvas (round 6: real
                # blending via ALPH / VP8L alpha; integer blend with
                # round-half-up, pinned by the encoder round trip)
                a = alpha.astype(np.uint32)[..., None]
                dst = canvas[fy:fy + fh, fx:fx + fw].astype(np.uint32)
                canvas[fy:fy + fh, fx:fx + fw] = (
                    (a * img + (255 - a) * dst + 127) // 255
                ).astype(np.uint8)
            else:
                canvas[fy:fy + fh, fx:fx + fw] = img
            frames.append(canvas.copy())
            if dispose_bg:
                canvas[fy:fy + fh, fx:fx + fw] = bg
    if not frames:
        raise DecodeError("WebP carries no ANMF frames")
    return frames


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP → HxWx3 uint8 (alpha dropped, the suite convention).
    Lossless (VP8L), lossy intra-only stills (VP8 key frames, round 6 —
    see operators/vp8.py), and animations (ANMF, round 6: the FIRST
    composited frame — the still-image convention for animated inputs;
    frame sampling goes through multimodal.split_video_frames)."""
    for fourcc, body in _riff_chunks(payload):
        if fourcc in (b"VP8L", b"VP8 "):
            return _decode_still_chunk(fourcc, body)
        # VP8X (extended container) and its metadata chunks (ICCP, EXIF,
        # XMP, ALPH — alpha is dropped by suite convention anyway) are
        # walked over: a VP8X STILL whose image data is a VP8L or VP8
        # chunk decodes; an ANMF animation decodes to its first frame.
        if fourcc == b"ANMF":
            return decode_webp_anim(payload)[0]
    raise DecodeError("WebP RIFF carries no VP8L/VP8 chunk")


# --- encoder (spec-valid subset; see module docstring) --------------------

def _balanced_lengths(used: list, alphabet_size: int) -> list:
    """Complete canonical code over the used symbols: every used symbol
    gets length L = ceil(log2(n)), then D = 2^L - n of them are
    promoted to L-1 so the Kraft sum is exactly 1 (D < n always).
    Compression-suboptimal, validity-guaranteed — the suite's contract
    is round-trip exactness, not ratio."""
    n = len(used)
    if n < 2:
        raise ValueError("balanced code needs >= 2 symbols")
    L = max(1, (n - 1).bit_length())
    D = (1 << L) - n
    lengths = [0] * alphabet_size
    for i, sym in enumerate(sorted(used)):
        lengths[sym] = (L - 1) if i < D else L
    return lengths


def _write_huffman_code(bw: _LBitWriter, lengths: list,
                        singles_ok: bool = True):
    """Write a code as the decoder's :func:`_read_huffman_code` reads
    it: the simple form for 1-2 symbols, else all code lengths directly
    through a balanced code-length code (no 16/17/18 repeats — spec
    permits plain zeros/lengths)."""
    nz = [(sym, ln) for sym, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and all(sym < 256 for sym, _ in nz):
        # simple form carries 8-bit symbol values only
        bw.write(1, 1)                       # simple
        bw.write(len(nz) - 1, 1)
        bw.write(1, 1)                       # 8-bit first symbol
        bw.write(nz[0][0], 8)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        return
    bw.write(0, 1)                           # code-length-coded
    used_cl = sorted({ln for ln in lengths})
    if len(used_cl) == 1:
        # Every symbol shares one code length (e.g. a channel using its
        # full 256-value alphabet: n=256 → L=8, D=0, no promotions).
        # A 1-symbol code-length code is valid: the decoder's _Huffman
        # single path reads ZERO bits per length, filling the whole
        # alphabet with that length.
        cl_lengths = [0] * 16
        cl_lengths[used_cl[0]] = 1
        bw.write(15, 4)                      # num_code_lengths = 19
        for slot in _CODE_LENGTH_ORDER:
            bw.write(cl_lengths[slot] if slot < 16 else 0, 3)
        bw.write(0, 1)                       # no max_symbol shortcut
        return                               # zero bits per symbol
    cl_lengths = _balanced_lengths(used_cl, 16)
    bw.write(15, 4)                          # num_code_lengths = 19
    for slot in _CODE_LENGTH_ORDER:
        bw.write(cl_lengths[slot] if slot < 16 else 0, 3)
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)                           # no max_symbol shortcut
    for ln in lengths:
        code, nbits = cl_codes[ln]
        bw.write(code, nbits)


class _SymbolWriter:
    """Two-pass channel coder: collect symbols, build balanced codes,
    emit. A constant channel collapses to a 1-symbol simple code
    (zero bits per pixel)."""

    def __init__(self, alphabet_size: int):
        self.alphabet_size = alphabet_size
        self.syms: list = []

    def write_tree(self, bw: _LBitWriter):
        used = sorted(set(self.syms)) or [0]
        if len(used) == 1:
            lengths = [0] * self.alphabet_size
            lengths[used[0]] = 1
            _write_huffman_code(bw, lengths)
            self._codes = None               # 1-symbol: zero bits/pixel
            return
        lengths = _balanced_lengths(used, self.alphabet_size)
        _write_huffman_code(bw, lengths)
        self._codes = _canonical_codes(lengths)

    def emit(self, bw: _LBitWriter, sym: int):
        if self._codes is None:
            return                           # 1-symbol tree: zero bits
        code, nbits = self._codes[sym]
        bw.write(code, nbits)


_NEAR_INDEX = {off: i + 1 for i, off in enumerate(_NEAR_DIST)}


def _write_entropy_image(bw: _LBitWriter, argb: np.ndarray,
                         level0: bool = False, use_lz77: bool = True,
                         near_distances: bool = False):
    """Encode an ARGB array as one entropy-coded image: no meta, no
    cache, one huffman group, distance-1 runs when ``use_lz77``.

    ``near_distances`` (round 6, VERDICT #7): additionally emit
    row-above copies through the 2-D NEAR-DISTANCE codes ((0,1) and
    (1,1) offsets) instead of direct distances — the decoder A/B that
    pins the reconstructed near-distance table as self-consistent in
    BOTH directions (encode: offset → code; decode: code → offset)."""
    h, w = argb.shape
    flat = argb.reshape(-1)
    npix = flat.size
    # tokenize: literals + (length, dist) runs
    tokens = []
    i = 0
    while i < npix:
        if near_distances and i >= w + 1:
            matched = False
            for off in ((0, 1), (1, 1)):     # dist = dy*w + dx
                d = off[1] * w + off[0]
                run = 0
                while (i + run < npix and run < 4096
                       and flat[i + run] == flat[i + run - d]):
                    run += 1
                if run >= 3:
                    tokens.append(("copy", run, _NEAR_INDEX[off]))
                    i += run
                    matched = True
                    break
            if matched:
                continue
        if use_lz77 and i > 0:
            run = 0
            while (i + run < npix and run < 4096
                   and flat[i + run] == flat[i - 1]):
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 121))  # direct distance 1
                i += run
                continue
        px = int(flat[i])
        tokens.append(("lit", px))
        i += 1
    green = _SymbolWriter(256 + _GREEN_EXTRA)
    red = _SymbolWriter(256)
    blue = _SymbolWriter(256)
    alpha = _SymbolWriter(256)
    dist = _SymbolWriter(_DIST_ALPHABET)
    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            green.syms.append((v >> 8) & 0xFF)
            red.syms.append((v >> 16) & 0xFF)
            blue.syms.append(v & 0xFF)
            alpha.syms.append((v >> 24) & 0xFF)
        else:
            lcode, _, _ = _prefix_encode(tok[1])
            green.syms.append(256 + lcode)
            dcode, _, _ = _prefix_encode(tok[2])
            dist.syms.append(dcode)
    bw.write(0, 1)                           # no color cache
    if level0:
        bw.write(0, 1)                       # no meta huffman
    for t in (green, red, blue, alpha, dist):
        t.write_tree(bw)
    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            green.emit(bw, (v >> 8) & 0xFF)
            red.emit(bw, (v >> 16) & 0xFF)
            blue.emit(bw, v & 0xFF)
            alpha.emit(bw, (v >> 24) & 0xFF)
        else:
            lcode, lbits, lval = _prefix_encode(tok[1])
            green.emit(bw, 256 + lcode)
            if lbits:
                bw.write(lval, lbits)
            dcode, dbits, dval = _prefix_encode(tok[2])
            dist.emit(bw, dcode)
            if dbits:
                bw.write(dval, dbits)


def encode_webp_lossless(img: np.ndarray, *, subtract_green: bool = True,
                         predictor_mode: int | None = None,
                         color_transform: tuple | None = None,
                         palette: bool = False,
                         use_lz77: bool = True,
                         near_distances: bool = False) -> bytes:
    """HxWx3 uint8 → RIFF/WEBP with a lossless VP8L chunk.
    ``predictor_mode``: apply the PREDICTOR transform with that single
    mode image-wide (exercises the corresponding inverse).
    ``color_transform``: ``(g2r, g2b, r2b)`` int8-semantics deltas for a
    whole-image cross-color transform — with it, every one of the four
    VP8L transforms is encoder-emittable. ``palette``: COLOR_INDEXING
    with pixel packing when <= 16 colors. Exact:
    ``decode_webp(encode_webp_lossless(img)) == img``."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_webp_lossless wants HxWx3 uint8")
    h, w, _ = img.shape
    argb = ((np.uint32(255) << 24)
            | (img[..., 0].astype(np.uint32) << 16)
            | (img[..., 1].astype(np.uint32) << 8)
            | img[..., 2].astype(np.uint32))
    bw = _LBitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                           # alpha unused
    bw.write(0, 3)                           # version

    if palette:
        colors = np.unique(argb.reshape(-1))
        if len(colors) > 256:
            raise ValueError("palette encode needs <= 256 colors")
        lookup = {int(c): i for i, c in enumerate(colors)}
        idx = np.vectorize(lambda p: lookup[int(p)])(argb).astype(
            np.uint32)
        n_colors = len(colors)
        width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4 else
                      1 if n_colors <= 16 else 0)
        bw.write(1, 1)
        bw.write(3, 2)                       # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        # delta-code the palette componentwise, mod 256
        raw = np.ascontiguousarray(colors).view(np.uint8) \
            .reshape(-1, 4).astype(np.int16)
        deltas = raw.copy()
        deltas[1:] = (raw[1:] - raw[:-1]) % 256
        pal_img = np.ascontiguousarray(
            deltas.astype(np.uint8)).view(np.uint32).reshape(1, -1)
        _write_entropy_image(bw, pal_img, use_lz77=False)
        if width_bits:
            ipp = 1 << width_bits
            ibits = 8 >> width_bits
            pw = (w + ipp - 1) >> width_bits
            packed = np.zeros((h, pw), dtype=np.uint32)
            for x in range(w):
                packed[:, x >> width_bits] |= \
                    idx[:, x] << ((x % ipp) * ibits)
            main = (np.uint32(255) << 24) | (packed << 8)
        else:
            main = (np.uint32(255) << 24) | (idx << 8)
        bw.write(0, 1)                       # end of transforms
        _write_entropy_image(bw, main, level0=True, use_lz77=use_lz77,
                             near_distances=near_distances)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)                   # SUBTRACT_GREEN
            a = (argb >> 24) & 0xFF
            r = (argb >> 16) & 0xFF
            g = (argb >> 8) & 0xFF
            b = argb & 0xFF
            argb = ((a << 24) | (((r - g) & 0xFF) << 16) | (g << 8)
                    | ((b - g) & 0xFF))
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            bits = 9                         # one element for the image
            bw.write(1, 1)
            bw.write(1, 2)                   # COLOR
            bw.write(bits - 2, 3)
            mw = (w + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            elem = np.full(
                (mh, mw),
                (np.uint32(255) << 24) | (r2b << 16) | (g2b << 8) | g2r,
                dtype=np.uint32)
            _write_entropy_image(bw, elem, use_lz77=False)
            # forward: subtract the deltas the decoder's inverse adds
            # (b uses the PRE-transform r, which the inverse has already
            # reconstructed by the time it adjusts b)
            out = argb.copy()
            for y in range(h):
                for x in range(w):
                    px = int(out[y, x])
                    a_ = (px >> 24) & 0xFF
                    r_ = (px >> 16) & 0xFF
                    g_ = (px >> 8) & 0xFF
                    b_ = px & 0xFF
                    nr = (r_ - _delta(g2r, g_)) & 0xFF
                    nb = (b_ - _delta(g2b, g_) - _delta(r2b, r_)) & 0xFF
                    out[y, x] = (a_ << 24) | (nr << 16) | (g_ << 8) | nb
            argb = out
        if predictor_mode is not None:
            bits = 9                         # 512-px blocks
            bw.write(1, 1)
            bw.write(0, 2)                   # PREDICTOR
            bw.write(bits - 2, 3)
            mw = (w + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            mode_img = np.full(
                (mh, mw),
                (np.uint32(255) << 24) | (predictor_mode << 8),
                dtype=np.uint32)
            _write_entropy_image(bw, mode_img, use_lz77=False)
            ch = _argb_to_channels(argb)
            res = np.zeros_like(ch)
            for y in range(h):
                for x in range(w):
                    pred = _pred_value(ch, y, x, predictor_mode, w)
                    res[y, x] = ch[y, x] - pred        # uint8 wraps
            argb = _channels_to_argb(res)
        bw.write(0, 1)                       # end of transforms
        _write_entropy_image(bw, argb, level0=True, use_lz77=use_lz77,
                             near_distances=near_distances)

    vp8l = bytes([0x2F]) + bw.finish()
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def encode_webp_anim(frames: list, *, offsets: list | None = None,
                     dispose: list | None = None,
                     alphas: list | None = None,
                     alph_filter: int = 0,
                     canvas: tuple | None = None,
                     bg: tuple = (255, 255, 255),
                     duration_ms: int = 40, lossy: bool = False) -> bytes:
    """Animated WebP encoder (round 6): VP8X(+ANIM flag) + ANIM + one
    ANMF per frame, each frame a VP8L (or lossy VP8) still placed at
    ``offsets[k]`` (even (x, y) pixels — the container stores them /2)
    with optional dispose-to-background. Round trip:
    ``decode_webp_anim(encode_webp_anim(frames))`` reproduces the
    composited canvases exactly for the lossless default.

    ``alphas`` (round 6): optional per-frame (h, w) uint8 alpha planes
    — emitted as ALPH sub-chunks (raw compression, ``alph_filter``
    0-3) with the blend bit set to BLEND, so the decoder alpha-blends
    the frame onto the canvas. Requires ``lossy=True`` (the container
    spec ties ALPH to lossy frames; lossless frames carry alpha in the
    VP8L A channel)."""
    if not frames:
        raise ValueError("need at least one frame")
    if alphas is not None and not lossy:
        raise ValueError("ALPH alpha planes require lossy frames")
    offsets = offsets or [(0, 0)] * len(frames)
    dispose = dispose or [0] * len(frames)
    alphas = alphas or [None] * len(frames)
    if canvas is None:
        cw = max(off[0] + f.shape[1] for off, f in zip(offsets, frames))
        ch = max(off[1] + f.shape[0] for off, f in zip(offsets, frames))
    else:
        cw, ch = canvas
    def chunk(cc, body):
        out = cc + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            out += b"\x00"
        return out
    vp8x = (bytes([0x02, 0, 0, 0])          # animation flag
            + (cw - 1).to_bytes(3, "little")
            + (ch - 1).to_bytes(3, "little"))
    anim = bytes([bg[2], bg[1], bg[0], 255]) + (0).to_bytes(2, "little")
    body = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim)
    for (fx, fy), disp, img, al in zip(offsets, dispose, frames,
                                       alphas):
        if fx % 2 or fy % 2:
            raise ValueError("ANMF offsets must be even (stored /2)")
        if lossy:
            from .vp8 import encode_vp8
            sub = b""
            if al is not None:
                sub += chunk(b"ALPH", encode_alph(al, filt=alph_filter))
            sub += chunk(b"VP8 ", encode_vp8(img, qi=12))
        else:
            still = encode_webp_lossless(img)
            sub = still[12:]                 # its VP8L chunk (+pad)
        anmf = ((fx // 2).to_bytes(3, "little")
                + (fy // 2).to_bytes(3, "little")
                + (img.shape[1] - 1).to_bytes(3, "little")
                + (img.shape[0] - 1).to_bytes(3, "little")
                + int(duration_ms).to_bytes(3, "little")
                + bytes([1 if disp else 0]))
        body += chunk(b"ANMF", anmf + sub)
    return b"RIFF" + len(body).to_bytes(4, "little") + body
