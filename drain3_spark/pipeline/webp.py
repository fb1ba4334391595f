"""WebP LOSSLESS (VP8L) — library-free decoder + encoder.

Public-spec work (RFC 9649 / the WebP lossless bitstream spec): RIFF
container, LSB-first bit reader, canonical prefix (Huffman) codes in
both their "simple" and code-length-coded forms, color cache, LZ77
backward references, and the four pixel transforms (predictor,
color/cross-color, subtract-green, color-indexing incl. sub-byte
pixel bundling for small palettes).

What is CERTIFIED by round-trip tests (our encoder → our decoder,
pixel-exact): literals with full canonical per-channel prefix codes,
the color cache, LZ77 refs with plain (code > 120) distances, the
subtract-green transform, the predictor transform, and color-indexing
palettes both above and below the 16-color bundling threshold.  The
2-D near-distance map (codes 1..120) and the cross-color transform
are implemented to the published rules but not exercised by our
encoder; real-world streams using them are decoded best-effort.
Lossy WebP (VP8 chunk) is a DECLARED stub — it needs a full VP8
intra decoder.

The encoder is deliberately minimal-but-valid: one prefix-code group
(no meta-prefix subimage), optional subtract-green, optional
greedy-hash LZ77, optional color cache — enough to produce real
multi-feature streams for the decoder to chew on and to round-trip
the q43 container matrix.

No counterpart exists in the reference (logpai/Drain3 has no media
handling).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# --------------------------------------------------------------- bits


class _BitReader:
    """VP8L bit reader: bytes consumed in order, bits within a byte
    consumed LSB first."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.bits: List[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ------------------------------------------------------- prefix codes

# code-length symbols are themselves coded; their lengths appear in
# this fixed order (spec §"Prefix code groups")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)


def _canonical_codes(lengths: List[int]) -> Dict[Tuple[int, int], int]:
    """(bit_length, code_value) -> symbol, codes assigned canonically
    (shorter codes first, then symbol order; code bits read MSB
    first — the DEFLATE convention VP8L shares)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= (l - prev_len)
        table[(l, code)] = s
        code += 1
        prev_len = l
    return table


class _PrefixCode:
    """Decoder side of one canonical prefix code."""

    def __init__(self, lengths: List[int]):
        nz = [l for l in lengths if l > 0]
        self.single: Optional[int] = None
        if len(nz) == 1:
            # a single-symbol code uses ZERO bits per symbol
            self.single = lengths.index(nz[0])
            self.table: Dict[Tuple[int, int], int] = {}
        else:
            self.table = _canonical_codes(lengths)
        self.max_len = max(nz) if nz else 0

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((l, code))
            if sym is not None:
                return sym
        raise ValueError("webp: invalid prefix code")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    lengths = [0] * alphabet_size
    if br.read_bit():                         # simple code
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        s0 = br.read(8 if first_8bit else 1)
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s1] = 1
        return _PrefixCode(lengths)
    num_codes = br.read(4) + 4
    clc_lengths = [0] * len(_CLC_ORDER)
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read_bit():                         # bounded symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = clc.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:                                 # 18
            symbol += 11 + br.read(7)
    return _PrefixCode(lengths)


def _write_prefix_code(bw: _BitWriter, lengths: List[int]) -> None:
    """Encoder: emit one prefix code, exactly mirroring the decoder's
    bit consumption.

    - ≤2 used symbols, all ≤255: the SIMPLE form;
    - one distinct length value across the whole alphabet (incl. the
      all-equal case): a code-length code with a single used symbol —
      the decoder then consumes ZERO bits for the symbol sequence, so
      the encoder writes none;
    - otherwise: the general code-length-coded form, one code-length
      symbol per alphabet entry (no 16/17/18 run symbols — valid,
      just not maximally compact)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if 0 < len(used) <= 2 and max(used) <= 255:
        bw.write(1, 1)                        # simple
        bw.write(len(used) - 1, 1)
        if used[0] <= 1 and len(used) == 1:
            bw.write(0, 1)                    # 1-bit first symbol
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)                    # 8-bit first symbol
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)                            # not simple
    distinct = sorted({l for l in lengths})
    clc_hist = [0] * 19
    for l in lengths:
        clc_hist[l] += 1
    if len(distinct) == 1:
        # single clc symbol -> decoder reads no symbol bits
        clc_lengths = [0] * 19
        clc_lengths[distinct[0]] = 1
    else:
        clc_lengths = _limited_huffman(clc_hist, max_len=7)
    bw.write(19 - 4, 4)                       # all 19 slots
    for sym in _CLC_ORDER:
        bw.write(clc_lengths[sym], 3)
    bw.write(0, 1)                            # no max_symbol bound
    if len(distinct) == 1:
        return
    codes = _canonical_encode_table(clc_lengths)
    for l in lengths:
        cl, cv = codes[l]
        for i in range(cl - 1, -1, -1):       # MSB first
            bw.write((cv >> i) & 1, 1)


def _canonical_encode_table(lengths: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (bit_length, code_value) for the encoder."""
    inv = _canonical_codes(lengths)
    return {s: (l, c) for (l, c), s in inv.items()}


def _limited_huffman(hist: List[int], max_len: int = 15) -> List[int]:
    """Length-limited Huffman code lengths for a histogram (package-
    merge-lite: build Huffman, then flatten overlong codes by
    re-running on damped weights).  Always yields a valid canonical
    set; single-symbol alphabets get length 1."""
    syms = [s for s, n in enumerate(hist) if n > 0]
    if not syms:
        return [0] * len(hist)
    if len(syms) == 1:
        out = [0] * len(hist)
        out[syms[0]] = 1
        return out
    import heapq
    weights = [max(n, 1) for n in hist]
    while True:
        heap = [(weights[s], s, (s,)) for s in syms]
        heapq.heapify(heap)
        depth = {s: 0 for s in syms}
        while len(heap) > 1:
            w1, _, g1 = heapq.heappop(heap)
            w2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            heapq.heappush(heap, (w1 + w2, min(g1 + g2), g1 + g2))
        if max(depth.values()) <= max_len:
            out = [0] * len(hist)
            for s in syms:
                out[s] = depth[s]
            return out
        weights = [(w + 1) // 2 if hist[i] > 0 else 0
                   for i, w in enumerate(weights)]
        weights = [max(w, 1) if hist[i] > 0 else 0
                   for i, w in enumerate(weights)]


def _emit_symbol(bw: _BitWriter, codes: Dict[int, Tuple[int, int]],
                 sym: int, single: bool) -> None:
    if single:
        return                               # zero-bit single-symbol code
    l, c = codes[sym]
    for i in range(l - 1, -1, -1):
        bw.write((c >> i) & 1, 1)


# -------------------------------------------------- LZ77 value coding

def _prefix_value_decode(br: _BitReader, sym: int) -> int:
    """Length/distance prefix symbol -> value (spec: first 4 symbols
    literal 1..4, then pairs with growing extra bits)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_value_encode(v: int) -> Tuple[int, int, int]:
    """value -> (symbol, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    extra = x.bit_length() - 2
    offset = (2 + ((x >> extra) & 1)) << extra
    return 2 * extra + ((x >> extra) & 1) + 2, x - offset, extra


# the 2-D near-distance map: codes 1..120 name the 120 (dx, dy)
# neighbors with dy in 0..7, dx in -8..7, ordered by ascending
# dx*dx + dy*dy (published table; regenerated here by its sort rule,
# ties broken by the published sequence's (dy, |dx|, dx<0) order)
def _near_distances() -> List[Tuple[int, int]]:
    cand = []
    for dy in range(8):
        for dx in range(-8, 8):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], p[1],
                             abs(p[0]), p[0] < 0))
    return cand[:120]


_NEAR = _near_distances()


def _distance_decode(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _NEAR[code - 1]
    return max(dy * xsize + dx, 1)


# ---------------------------------------------------------- transforms

_PRED_BLACK = 0xFF000000


def _avg2(a, b):
    return (a & 0xFEFEFEFE) // 2 + (b & 0xFEFEFEFE) // 2 \
        + (a & b & 0x01010101)


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    """The 14 spatial predictors, applied per channel (args/result are
    packed ARGB uint32)."""
    def chans(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF,
                p & 0xFF)

    def pack(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    if mode == 0:
        return _PRED_BLACK
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        la, lr, lg, lb = chans(L)
        ta, tr, tg, tb = chans(T)
        ra, rr, rg, rb = chans(TR)
        return pack(*[((x + 2 * y + z) + 2) >> 2 for x, y, z in
                      zip((la, lr, lg, lb), (ta, tr, tg, tb),
                          (ra, rr, rg, rb))])
    if mode == 6:
        la, lr, lg, lb = chans(L)
        ta, tr, tg, tb = chans(TL)
        return pack(*[(x + y + 1) >> 1 for x, y in
                      zip((la, lr, lg, lb), (ta, tr, tg, tb))])
    if mode == 7:
        la, lr, lg, lb = chans(L)
        ta, tr, tg, tb = chans(T)
        return pack(*[(x + y + 1) >> 1 for x, y in
                      zip((la, lr, lg, lb), (ta, tr, tg, tb))])
    if mode == 8:
        la, lr, lg, lb = chans(TL)
        ta, tr, tg, tb = chans(T)
        return pack(*[(x + y + 1) >> 1 for x, y in
                      zip((la, lr, lg, lb), (ta, tr, tg, tb))])
    if mode == 9:
        la, lr, lg, lb = chans(T)
        ta, tr, tg, tb = chans(TR)
        return pack(*[(x + y + 1) >> 1 for x, y in
                      zip((la, lr, lg, lb), (ta, tr, tg, tb))])
    if mode == 10:
        aa = _avg2_c(chans(L), chans(TL))
        bb = _avg2_c(chans(T), chans(TR))
        return pack(*[(x + y + 1) >> 1 for x, y in zip(aa, bb)])
    if mode == 11:                            # Select
        lc, tc, tlc = chans(L), chans(T), chans(TL)
        pl = sum(abs(tc[i] - tlc[i]) for i in range(4))
        pt = sum(abs(lc[i] - tlc[i]) for i in range(4))
        return L if pl < pt else T
    if mode == 12:                            # ClampAddSubtractFull
        lc, tc, tlc = chans(L), chans(T), chans(TL)
        return pack(*[_clamp255(lc[i] + tc[i] - tlc[i]) for i in range(4)])
    if mode == 13:                            # ClampAddSubtractHalf
        lc, tc, tlc = chans(L), chans(T), chans(TL)
        out = []
        for i in range(4):
            ave = (lc[i] + tc[i]) >> 1
            out.append(_clamp255(ave + ((ave - tlc[i]) >> 1)))
        return pack(*out)
    raise ValueError("webp: bad predictor mode")


def _avg2_c(c1, c2):
    return tuple((x + y + 1) >> 1 for x, y in zip(c1, c2))


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _apply_predictor_inverse(argb: np.ndarray, modes: np.ndarray,
                             tile_bits: int) -> None:
    """In-place inverse predictor transform (decode side): residual +
    prediction mod 256 per channel.  Row 0 uses L (except pixel 0:
    black); column 0 uses T."""
    h, w = argb.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = _PRED_BLACK
            elif y == 0:
                pred = int(argb[0, x - 1]) | 0  # L
            elif x == 0:
                pred = int(argb[y - 1, 0])      # T
            else:
                mode = int(modes[y >> tile_bits, x >> tile_bits])
                L = int(argb[y, x - 1])
                T = int(argb[y - 1, x])
                TL = int(argb[y - 1, x - 1])
                TR = int(argb[y - 1, x + 1]) if x + 1 < w \
                    else int(argb[y - 1, 0])
                pred = _predict(mode, L, T, TL, TR)
            cur = int(argb[y, x])
            a = ((cur >> 24) + (pred >> 24)) & 0xFF
            r = (((cur >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF
            g = (((cur >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF
            b = ((cur & 0xFF) + (pred & 0xFF)) & 0xFF
            argb[y, x] = (a << 24) | (r << 16) | (g << 8) | b


def _apply_color_inverse(argb: np.ndarray, tiles: np.ndarray,
                         tile_bits: int) -> None:
    """Inverse cross-color transform (decode side, published deltas:
    green->red, green->blue, red->blue; multipliers are signed 3.5
    fixed point stored in the tile pixel's b, g, r channels)."""
    h, w = argb.shape

    def cdelta(m: int, c: int) -> int:
        ms = m - 256 if m >= 128 else m       # int8
        return (ms * (c - 256 if c >= 128 else c)) >> 5

    for y in range(h):
        for x in range(w):
            t = int(tiles[y >> tile_bits, x >> tile_bits])
            g2r = t & 0xFF
            g2b = (t >> 8) & 0xFF
            r2b = (t >> 16) & 0xFF
            cur = int(argb[y, x])
            a = (cur >> 24) & 0xFF
            r = (cur >> 16) & 0xFF
            g = (cur >> 8) & 0xFF
            b = cur & 0xFF
            r = (r + cdelta(g2r, g)) & 0xFF
            b = (b + cdelta(g2b, g) + cdelta(r2b, r)) & 0xFF
            argb[y, x] = (a << 24) | (r << 16) | (g << 8) | b


# ------------------------------------------------------------- decode


def _decode_entropy_coded_image(br: _BitReader, w: int, h: int,
                                main: bool) -> np.ndarray:
    """One VP8L entropy-coded image -> (h, w) uint32 ARGB.  ``main``
    enables the meta-prefix subimage (spatially varying code groups);
    transform/entropy subimages never have one.  Stream order per the
    spec grammar: color-cache-info, [meta-prefix], prefix-codes,
    lz77-coded-image."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    meta = None
    meta_bits = 0
    n_groups = 1
    if main and br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_coded_image(br, mw, mh, main=False)
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1

    groups = []
    green_size = 256 + 24 + cache_size
    for _ in range(n_groups):
        groups.append((_read_prefix_code(br, green_size),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 256),
                       _read_prefix_code(br, 40)))

    out = np.zeros(h * w, dtype=np.uint32)
    pos = 0
    total = h * w
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            mp = int(meta[y >> meta_bits, x >> meta_bits])
            gcode = groups[(mp >> 8) & 0xFFFF]
        else:
            gcode = groups[0]
        gC, rC, bC, aC, dC = gcode
        s = gC.decode(br)
        if s < 256:                           # literal
            r = rC.decode(br)
            b = bC.decode(br)
            a = aC.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache_size:
                cache[(px * 0x1E35A7BD & 0xFFFFFFFF) >>
                      (32 - cache_bits)] = px
        elif s < 256 + 24:                    # LZ77 backref
            length = _prefix_value_decode(br, s - 256)
            dsym = dC.decode(br)
            dist_code = _prefix_value_decode(br, dsym)
            dist = min(_distance_decode(dist_code, w), pos)
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[(px * 0x1E35A7BD & 0xFFFFFFFF) >>
                          (32 - cache_bits)] = px
                if pos >= total:
                    break
        else:                                 # color cache hit
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out.reshape(h, w)


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload -> (H, W, 3) uint8 RGB (alpha dropped, as
    the rest of the image family does)."""
    if not data or data[0] != 0x2F:
        raise ValueError("webp: bad VP8L signature")
    br = _BitReader(data)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()                             # alpha hint
    if br.read(3) != 0:
        raise ValueError("webp: unsupported VP8L version")

    transforms = []                           # applied in reverse later
    palette = None
    xsize = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype == 0:                        # PREDICTOR
            tbits = br.read(3) + 2
            tw = (xsize + (1 << tbits) - 1) >> tbits
            th = (h + (1 << tbits) - 1) >> tbits
            tiles = _decode_entropy_coded_image(br, tw, th, main=False)
            transforms.append(("pred", tbits, (tiles >> 8) & 0xFF))
        elif ttype == 1:                      # COLOR (cross-color)
            tbits = br.read(3) + 2
            tw = (xsize + (1 << tbits) - 1) >> tbits
            th = (h + (1 << tbits) - 1) >> tbits
            tiles = _decode_entropy_coded_image(br, tw, th, main=False)
            transforms.append(("color", tbits, tiles))
        elif ttype == 2:                      # SUBTRACT_GREEN
            transforms.append(("subgreen",))
        else:                                 # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal = _decode_entropy_coded_image(br, n_colors, 1,
                                              main=False)[0]
            # palette entries are delta-coded left-to-right
            acc = np.zeros(n_colors, dtype=np.uint32)
            prev = 0
            for i in range(n_colors):
                cur = int(pal[i])
                px = 0
                for shift in (24, 16, 8, 0):
                    px |= ((((cur >> shift) + (prev >> shift)) & 0xFF)
                           << shift)
                acc[i] = px
                prev = px
            palette = acc
            if n_colors <= 2:
                pbits = 3
            elif n_colors <= 4:
                pbits = 2
            elif n_colors <= 16:
                pbits = 1
            else:
                pbits = 0
            transforms.append(("palette", pbits, palette))
            if pbits:
                xsize = (xsize + (1 << pbits) - 1) >> pbits

    argb = _decode_entropy_coded_image(br, xsize, h, main=True)

    for t in reversed(transforms):
        if t[0] == "palette":
            pbits, pal = t[1], t[2]
            if pbits:
                # unbundle: each coded pixel's GREEN packs 2^pbits
                # indices, low bits = leftmost pixel
                per = 1 << pbits
                ibits = 8 >> pbits
                idx = np.zeros((h, w), dtype=np.int64)
                for y in range(h):
                    for x in range(w):
                        packed = int(argb[y, x >> pbits]) >> 8 & 0xFF
                        sub = x & (per - 1)
                        idx[y, x] = (packed >> (sub * ibits)) \
                            & ((1 << ibits) - 1)
            else:
                idx = ((argb >> 8) & 0xFF).astype(np.int64)
            idx = np.clip(idx, 0, len(pal) - 1)
            argb = pal[idx]
            xsize = w
        elif t[0] == "subgreen":
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & np.uint32(0xFF00FF00)) | (r << 16) | b
        elif t[0] == "pred":
            _apply_predictor_inverse(argb, t[2], t[1])
        elif t[0] == "color":
            _apply_color_inverse(argb, t[2], t[1])

    out = np.zeros((h, w, 3), dtype=np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container -> RGB pixels.  Lossless (VP8L) only; the
    lossy VP8 and extended VP8X paths are declared stubs."""
    raw = bytes(payload)
    if raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(raw):
        tag = raw[pos:pos + 4]
        size = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
        body = raw[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "webp: lossy VP8 needs a full VP8 intra decoder; only "
                "lossless VP8L is implemented")
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk found")


# ------------------------------------------------------------- encode


def _encode_image_stream(bw: _BitWriter, argb: np.ndarray,
                         use_lz77: bool, cache_bits: int,
                         is_main: bool = True) -> None:
    """One entropy-coded image (single prefix group; ``is_main`` adds
    the no-meta-prefix bit the spatially-coded grammar carries)."""
    h, w = argb.shape
    flat = argb.reshape(-1)
    total = len(flat)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    # token stream: ("lit", px) | ("cache", idx) | ("ref", len, dist)
    tokens: List[tuple] = []
    if use_lz77:
        # greedy hash of 2-pixel sequences
        table: Dict[Tuple[int, int], int] = {}
        pos = 0
        while pos < total:
            if pos + 1 < total:
                key = (int(flat[pos]), int(flat[pos + 1]))
                cand = table.get(key)
                table[key] = pos
                if cand is not None and pos - cand > 120:
                    length = 0
                    dist = pos - cand
                    while (pos + length < total and length < 4096
                           and flat[pos + length - dist]
                           == flat[pos + length]):
                        length += 1
                    if length >= 3:
                        tokens.append(("ref", length, dist))
                        pos += length
                        continue
            px = int(flat[pos])
            if cache_size:
                ci = (px * 0x1E35A7BD & 0xFFFFFFFF) >> (32 - cache_bits)
                if cache[ci] == px:
                    tokens.append(("cache", ci))
                else:
                    cache[ci] = px
                    tokens.append(("lit", px))
            else:
                tokens.append(("lit", px))
            pos += 1
    else:
        for pos in range(total):
            px = int(flat[pos])
            if cache_size:
                ci = (px * 0x1E35A7BD & 0xFFFFFFFF) >> (32 - cache_bits)
                if cache[ci] == px:
                    tokens.append(("cache", ci))
                    continue
                cache[ci] = px
            tokens.append(("lit", px))

    # histograms
    green_size = 256 + 24 + cache_size
    gh = [0] * green_size
    rh = [0] * 256
    bh = [0] * 256
    ah = [0] * 256
    dh = [0] * 40
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            gh[(px >> 8) & 0xFF] += 1
            rh[(px >> 16) & 0xFF] += 1
            bh[px & 0xFF] += 1
            ah[(px >> 24) & 0xFF] += 1
        elif t[0] == "cache":
            gh[256 + 24 + t[1]] += 1
        else:
            ls, _, _ = _prefix_value_encode(t[1])
            gh[256 + ls] += 1
            ds, _, _ = _prefix_value_encode(t[2] + 120)
            dh[ds] += 1

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if is_main:
        bw.write(0, 1)                        # no meta-prefix subimage

    codes = []
    for hist in (gh, rh, bh, ah, dh):
        lengths = _limited_huffman(hist)
        _write_prefix_code(bw, lengths)
        codes.append((_canonical_encode_table(lengths),
                      sum(1 for l in lengths if l) == 1))
    (gc, gs), (rc, rs), (bc, bs), (ac, asingle), (dc, dsingle) = codes

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            _emit_symbol(bw, gc, (px >> 8) & 0xFF, gs)
            _emit_symbol(bw, rc, (px >> 16) & 0xFF, rs)
            _emit_symbol(bw, bc, px & 0xFF, bs)
            _emit_symbol(bw, ac, (px >> 24) & 0xFF, asingle)
        elif t[0] == "cache":
            _emit_symbol(bw, gc, 256 + 24 + t[1], gs)
        else:
            ls, lx, ln = _prefix_value_encode(t[1])
            _emit_symbol(bw, gc, 256 + ls, gs)
            bw.write(lx, ln)
            ds, dx, dn = _prefix_value_encode(t[2] + 120)
            _emit_symbol(bw, dc, ds, dsingle)
            bw.write(dx, dn)


def _apply_predictor_forward(argb: np.ndarray, mode: int,
                             tile_bits: int) -> np.ndarray:
    """Forward (encode-side) fixed-mode predictor: residual = pixel -
    prediction mod 256 per channel, with the same border conventions
    as the decoder (pixel 0 black, row 0 L, column 0 T, TR wrapping
    to the leftmost pixel of the row above)."""
    h, w = argb.shape
    out = argb.copy()
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = _PRED_BLACK
            elif y == 0:
                pred = int(argb[0, x - 1])
            elif x == 0:
                pred = int(argb[y - 1, 0])
            else:
                L = int(argb[y, x - 1])
                T = int(argb[y - 1, x])
                TL = int(argb[y - 1, x - 1])
                TR = int(argb[y - 1, x + 1]) if x + 1 < w \
                    else int(argb[y - 1, 0])
                pred = _predict(mode, L, T, TL, TR)
            cur = int(argb[y, x])
            a = ((cur >> 24) - (pred >> 24)) & 0xFF
            r = (((cur >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF
            g = (((cur >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF
            b = ((cur & 0xFF) - (pred & 0xFF)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _wrap_riff(body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body + pad
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_webp_lossless(img: np.ndarray, subtract_green: bool = True,
                         use_lz77: bool = True, cache_bits: int = 6,
                         predictor_mode: Optional[int] = None) -> bytes:
    """(H, W, 3) uint8 RGB -> RIFF/WEBP with one VP8L chunk.  One
    prefix-code group, optional subtract-green transform, optional
    fixed-mode predictor transform, greedy LZ77 with plain (>120)
    distances, optional color cache — a compact, fully spec-valid
    stream our decoder reads back pixel-exactly."""
    h, w, _ = img.shape
    argb = (np.uint32(0xFF) << 24) \
        | (img[..., 0].astype(np.uint32) << 16) \
        | (img[..., 1].astype(np.uint32) << 8) \
        | img[..., 2].astype(np.uint32)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                            # no alpha
    bw.write(0, 3)                            # version
    # transform headers are written in stream order; the decoder
    # inverts them in reverse, so the forward pipeline applies them in
    # the same order they are written
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                        # transform type 2
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        argb = (argb & np.uint32(0xFF00FF00)) | (r << 16) | b
    if predictor_mode is not None:
        tbits = 4
        bw.write(1, 1)
        bw.write(0, 2)                        # transform type 0
        bw.write(tbits - 2, 3)
        tw = (w + (1 << tbits) - 1) >> tbits
        th = (h + (1 << tbits) - 1) >> tbits
        tiles = np.full((th, tw), np.uint32(0xFF000000)
                        | (predictor_mode << 8), dtype=np.uint32)
        _encode_image_stream(bw, tiles, use_lz77=False, cache_bits=0,
                             is_main=False)
        argb = _apply_predictor_forward(argb, predictor_mode, tbits)
    bw.write(0, 1)                            # end of transforms
    _encode_image_stream(bw, argb, use_lz77, cache_bits)
    return _wrap_riff(bw.bytes())


def encode_webp_palette(img: np.ndarray) -> bytes:
    """Palette (color-indexing) encoding — requires ≤256 distinct
    colors; palettes of ≤16 colors exercise the sub-byte pixel
    bundling path."""
    h, w, _ = img.shape
    argb = (np.uint32(0xFF) << 24) \
        | (img[..., 0].astype(np.uint32) << 16) \
        | (img[..., 1].astype(np.uint32) << 8) \
        | img[..., 2].astype(np.uint32)
    colors, inverse = np.unique(argb.reshape(-1), return_inverse=True)
    n_colors = len(colors)
    if n_colors > 256:
        raise ValueError("webp palette: more than 256 colors")
    idx = inverse.reshape(h, w).astype(np.uint32)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(3, 2)                            # transform type 3
    bw.write(n_colors - 1, 8)
    # delta-code palette entries per channel
    pal = np.zeros(n_colors, dtype=np.uint32)
    prev = 0
    for i in range(n_colors):
        cur = int(colors[i])
        d = 0
        for shift in (24, 16, 8, 0):
            d |= ((((cur >> shift) - (prev >> shift)) & 0xFF) << shift)
        pal[i] = d
        prev = cur
    _encode_image_stream(bw, pal.reshape(1, n_colors), use_lz77=False,
                         cache_bits=0, is_main=False)
    if n_colors <= 2:
        pbits = 3
    elif n_colors <= 4:
        pbits = 2
    elif n_colors <= 16:
        pbits = 1
    else:
        pbits = 0
    if pbits:
        per = 1 << pbits
        ibits = 8 >> pbits
        pw = (w + per - 1) // per
        packed = np.zeros((h, pw), dtype=np.uint32)
        for y in range(h):
            for x in range(w):
                packed[y, x >> pbits] |= idx[y, x] << ((x & (per - 1))
                                                       * ibits)
        coded = (np.uint32(0xFF) << 24) | (packed << 8)
    else:
        coded = (np.uint32(0xFF) << 24) | (idx << 8)
    bw.write(0, 1)                            # end of transforms
    _encode_image_stream(bw, coded, use_lz77=True, cache_bits=0)
    return _wrap_riff(bw.bytes())
