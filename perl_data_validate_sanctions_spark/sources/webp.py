"""Stdlib+numpy WebP-lossless (VP8L) codec — the last real-decode leg.

Implements the public "WebP Lossless Bitstream Specification" from
scratch (no libwebp, no Pillow): RIFF container walk, LSB-first bit
reader, canonical prefix codes (simple and code-length-coded, with the
token-count cap), META prefix-code image, color cache, LZ77 backward
references with the 2D short-distance map, and all four inverse
transforms (predictor with its 14 modes, color transform, subtract
green, color indexing incl. sub-byte pixel packing).

The encoder emits a deliberately plain but fully spec-conformant
stream for grayscale fixtures: no transforms, no cache, single prefix
group, gray values carried in the GREEN channel with 1-symbol (zero
bit) codes for the other channels. Conformance is cross-checked in
tests against the SYSTEM libwebp via ctypes when available
(tests/test_webp.py): our encoder's bytes must decode identically
under libwebp, and libwebp's own lossless encoder output — which uses
transforms, caches, and short-distance LZ77 — must decode identically
under THIS decoder.

Scope (documented, enforced): the FROM-SCRATCH decoder covers VP8L
(lossless) streams only. Lossy VP8 and extended VP8X containers are
dispatched by ``decode_webp_gray`` to the SYSTEM libwebp via ctypes
(sources/webp_sys.py — the same public C library this module's tests
already use as the VP8L conformance oracle) when it is present; when
it is absent they raise ``ValueError`` from ``decode_webp_argb`` and
surface as the integrity check's distinct ``codec_unavailable``
violation, never as corruption.

Throughput note (same class as PNG's Paeth caveat): entropy decoding
is inherently sequential, so this decoder runs a per-pixel Python
loop — ~0.1-0.3 Mpx/s/core. Fine for the 64×48 validation fixtures
and parity tests; a 100 TB pipeline with real webp volume would swap
the inner loop for a C codec behind the same sniff, exactly like the
PNG Pillow gate (sources/png.py docstring).

Reference analog: the Perl reference parses every feed format it
claims end-to-end (Fetcher.pm:258-806); this closes the one payload
format the engine recognized but could not open.
"""

from __future__ import annotations

import struct

import numpy as np

WEBP_RIFF = b"RIFF"
WEBP_FOURCC = b"WEBP"
VP8L_MAGIC_BYTE = 0x2F

# ---------------------------------------------------------------- bits ---


class _BitReader:
    """LSB-first bit reader with a buffered peek window (the VP8L
    entropy loop is inherently sequential; the u64-ish buffer plus the
    prefix-code peek LUT below is what keeps the per-pixel cost at
    Python-interpreter floor instead of per-BIT floor — same device as
    jpeg.py's sliding-window Huffman)."""

    __slots__ = ("data", "n", "bytepos", "buf", "nbuf", "consumed_pad")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.bytepos = 0
        self.buf = 0
        self.nbuf = 0
        self.consumed_pad = 0  # phantom zero-bits consumed past the end

    def _fill(self, need: int) -> None:
        data, pos, n = self.data, self.bytepos, self.n
        buf, nbuf = self.buf, self.nbuf
        while nbuf < need:
            if pos < n:
                buf |= data[pos] << nbuf
                pos += 1
            else:
                # pad with zeros; consuming any of them = truncation
                self.consumed_pad += 8
            nbuf += 8
        self.data_pos_store(pos, buf, nbuf)

    def data_pos_store(self, pos: int, buf: int, nbuf: int) -> None:
        self.bytepos, self.buf, self.nbuf = pos, buf, nbuf

    def peek(self, k: int) -> int:
        if self.nbuf < k:
            self._fill(k)
        return self.buf & ((1 << k) - 1)

    def skip(self, k: int) -> None:
        self.buf >>= k
        self.nbuf -= k
        if self.consumed_pad and self.nbuf < self.consumed_pad:
            raise ValueError("bitstream truncated")

    def bit(self) -> int:
        if self.nbuf < 1:
            self._fill(1)
        v = self.buf & 1
        self.skip(1)
        return v

    def bits(self, n: int) -> int:
        if self.nbuf < n:
            self._fill(n)
        v = self.buf & ((1 << n) - 1)
        self.skip(n)
        return v


class _BitWriter:
    """LSB-first bit writer (encoder side)."""

    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


# ------------------------------------------------------------- huffman ---

# code-length-code transmission order (spec §"Decoding the code lengths")
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14,
             15)
_MAX_CODE_LENGTH = 15


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), deflate-canonical (RFC 1951 §3.2.2)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


_LUT_BITS = 9  # root peek width: covers virtually all hot symbols


class _Huffman:
    """Prefix-code decoder: canonical codes with a deflate-style
    root LUT — peek ``_LUT_BITS`` stream bits (LSB-first window; the
    first-read bit is the code's MSB, so LUT keys are the bit-reversed
    code), one dict/list hit for any code ≤ 9 bits, slow canonical walk
    for the rare longer ones.

    A lone used symbol is a zero-bit code (matches libwebp's table
    builder and the simple-code semantics); anything else must form a
    COMPLETE tree or the stream is rejected."""

    __slots__ = ("table", "single", "lut")

    def __init__(self, lengths: list[int]):
        used = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][0]
            self.table = None
            self.lut = None
            return
        self.single = None
        space = 1 << _MAX_CODE_LENGTH
        for _, ln in used:
            if ln > _MAX_CODE_LENGTH:
                raise ValueError("code length > 15")
            space -= (1 << _MAX_CODE_LENGTH) >> ln
        if space != 0:
            raise ValueError("prefix code not complete")
        codes = _canonical_codes(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        # root LUT: entry = (sym << 4) | code_length, 0 = escape
        lut = [0] * (1 << _LUT_BITS)
        for sym, (code, ln) in codes.items():
            if ln > _LUT_BITS:
                continue
            # bit-reverse the code: stream window is LSB-first
            rev = 0
            c = code
            for _ in range(ln):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            step = 1 << ln
            entry = (sym << 4) | ln
            for w in range(rev, 1 << _LUT_BITS, step):
                lut[w] = entry
        self.lut = lut

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        e = self.lut[br.peek(_LUT_BITS)]
        if e:
            br.skip(e & 15)
            return e >> 4
        # slow path: canonical walk for codes longer than the LUT
        acc = 0
        ln = 0
        table = self.table
        for _ in range(_MAX_CODE_LENGTH):
            acc = (acc << 1) | br.bit()
            ln += 1
            sym = table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in stream")


def _read_code_lengths(br: _BitReader, cl_huff: _Huffman,
                       alphabet_size: int) -> list[int]:
    """Symbol code lengths via the RLE code-length code, with the
    optional transmitted token-count cap (spec: 'use length' bit)."""
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_tokens = 2 + br.bits(length_nbits)
    else:
        max_tokens = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8  # spec default
    symbol = 0
    while symbol < alphabet_size:
        if max_tokens <= 0:
            break
        max_tokens -= 1
        cl = cl_huff.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.bits(2), prev
            elif cl == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:  # 18
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("code-length repeat overruns alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.bit():  # simple code: 1 or 2 symbols
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol on 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # lone symbol → zero-bit read path
        return _Huffman(lengths)
    num_cl = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_huff = _Huffman(cl_lengths)
    return _Huffman(_read_code_lengths(br, cl_huff, alphabet_size))


# ------------------------------------------------------------ lz77 bits ---


def _prefix_value(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decode (spec §"LZ77 backward ref")."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _make_distance_map() -> list[tuple[int, int]]:
    """The 120-entry 2D short-distance map: neighbors (x, y) of the
    current pixel, ordered by squared euclidean distance, ties by |x|
    then sign (positive first). Cross-checked against the system
    libwebp in tests/test_webp.py (its lossless encoder emits these
    codes constantly)."""
    cand = []
    for y in range(0, 9):
        for x in range(-8, 9):
            if y == 0 and x <= 0:
                continue
            if y > 0 or x > 0:
                cand.append((x, y))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]),
                             p[0] < 0, p[1]))
    return cand[:120]


_DIST_MAP = _make_distance_map()


# ------------------------------------------------------------- decoder ---

_CACHE_MULT = 0x1E35A7BD


def _decode_image_stream(br: _BitReader, w: int, h: int,
                         is_level0: bool):
    """Decode one spatially-coded image → (pixels uint32 ARGB flat,
    transforms list). Sub-images recurse with is_level0=False."""
    transforms: list[tuple] = []
    xsize = w
    if is_level0:
        seen = set()
        while br.bit():
            ttype = br.bits(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                bits = br.bits(3) + 2
                bw = _sub_size(xsize, bits)
                bh = _sub_size(h, bits)
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((0, bits, sub))
            elif ttype == 1:  # COLOR
                bits = br.bits(3) + 2
                bw = _sub_size(xsize, bits)
                bh = _sub_size(h, bits)
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((1, bits, sub))
            elif ttype == 2:  # SUBTRACT GREEN
                transforms.append((2,))
            else:  # COLOR INDEXING
                n_colors = br.bits(8) + 1
                pal, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are component-wise deltas
                for i in range(1, n_colors):
                    pal[i] = _add_pixels(pal[i], pal[i - 1])
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal, xsize))
                xsize = _sub_size(xsize, width_bits)

    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.bit():
        meta_bits = br.bits(3) + 2
        mw = _sub_size(xsize, meta_bits)
        mh = _sub_size(h, meta_bits)
        meta, _ = _decode_image_stream(br, mw, mh, False)
        num_groups = 0
        for px in meta:
            idx = (px >> 8) & 0xFFFF  # (red << 8) | green
            if idx + 1 > num_groups:
                num_groups = idx + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_huffman_code(br, green_alpha),
            _read_huffman_code(br, 256),  # red
            _read_huffman_code(br, 256),  # blue
            _read_huffman_code(br, 256),  # alpha
            _read_huffman_code(br, 40),   # distance
        ))

    n = xsize * h
    pixels = [0] * n
    cache = [0] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    group = groups[0]
    mw = _sub_size(xsize, meta_bits) if meta is not None else 0
    while pos < n:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            mpx = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            group = groups[(mpx >> 8) & 0xFFFF]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.read(br)
        if s < 256:
            red = r_code.read(br)
            blue = b_code.read(br)
            alpha = a_code.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            pos += 1
            if cache_bits:
                cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> cache_shift] = px
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dcode = _prefix_value(br, d_code.read(br))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * xsize
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("backward reference out of range")
            src = pos - dist
            if cache_bits:
                for _ in range(length):
                    px = pixels[src]
                    pixels[pos] = px
                    cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> cache_shift] \
                        = px
                    src += 1
                    pos += 1
            else:
                for _ in range(length):
                    pixels[pos] = pixels[src]
                    src += 1
                    pos += 1
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            px = cache[idx]
            pixels[pos] = px
            pos += 1
    return pixels, transforms


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _add_pixels(a: int, b: int) -> int:
    """Component-wise modulo-256 pixel addition."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(left: int, top: int, topleft: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (left >> sh) & 0xFF
        tc = (top >> sh) & 0xFF
        tlc = (topleft >> sh) & 0xFF
        pred = lc + tc - tlc
        p_l += abs(pred - lc)
        p_t += abs(pred - tc)
    return left if p_l < p_t else top


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)
                      - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(ab: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        x = (ab >> sh) & 0xFF
        cc = (c >> sh) & 0xFF
        out |= _clamp(x + (x - cc) // 2) << sh
    return out


def _apply_inverse_predictor(pixels: list[int], w: int, h: int,
                             bits: int, sub: list[int]) -> None:
    sw = _sub_size(w, bits)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pixels[pos - 1]  # L
        elif x == 0:
            pred = pixels[pos - w]  # T
        else:
            mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
            left = pixels[pos - 1]
            top = pixels[pos - w]
            tl = pixels[pos - w - 1]
            tr = pixels[pos - w + 1]  # wraps to row start at x==w-1
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), top)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(tl, top)
            elif mode == 9:
                pred = _avg2(top, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(top, tr))
            elif mode == 11:
                pred = _select(left, top, tl)
            elif mode == 12:
                pred = _clamp_add_sub_full(left, top, tl)
            elif mode == 13:
                pred = _clamp_add_sub_half(_avg2(left, top), tl)
            else:
                raise ValueError(f"bad predictor mode {mode}")
        pixels[pos] = _add_pixels(pixels[pos], pred)


def _ct_delta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 — the color-transform delta."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_inverse_color_transform(pixels: list[int], w: int, h: int,
                                   bits: int, sub: list[int]) -> None:
    sw = _sub_size(w, bits)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        cte = sub[(y >> bits) * sw + (x >> bits)]
        g2r = cte & 0xFF          # blue channel
        g2b = (cte >> 8) & 0xFF   # green channel
        r2b = (cte >> 16) & 0xFF  # red channel
        px = pixels[pos]
        green = (px >> 8) & 0xFF
        red = (px >> 16) & 0xFF
        blue = px & 0xFF
        red = (red + _ct_delta(g2r, green)) & 0xFF
        blue = (blue + _ct_delta(g2b, green)) & 0xFF
        blue = (blue + _ct_delta(r2b, red)) & 0xFF
        pixels[pos] = (px & 0xFF00FF00) | (red << 16) | blue


def _apply_inverse_transforms(pixels: list[int], w: int, h: int,
                              transforms: list[tuple]) -> list[int]:
    xsize = w
    # color-indexing changed the coded width; recover it for unpacking
    for t in transforms:
        if t[0] == 3:
            xsize = _sub_size(t[3], t[1])
    for t in reversed(transforms):
        if t[0] == 3:  # color indexing (+ optional pixel packing)
            width_bits, pal, full_w = t[1], t[2], t[3]
            n_pal = len(pal)
            out = [0] * (full_w * h)
            if width_bits == 0:
                for pos in range(full_w * h):
                    idx = (pixels[pos] >> 8) & 0xFF
                    out[pos] = pal[idx] if idx < n_pal else 0
            else:
                per = 1 << width_bits
                ibits = 8 >> width_bits
                mask = (1 << ibits) - 1
                for y in range(h):
                    for x in range(full_w):
                        packed = pixels[y * xsize + (x >> width_bits)]
                        shift = (x % per) * ibits
                        idx = ((packed >> 8) >> shift) & mask
                        out[y * full_w + x] = pal[idx] if idx < n_pal else 0
            pixels = out
            xsize = full_w
        elif t[0] == 2:  # subtract green
            for pos in range(xsize * h):
                px = pixels[pos]
                g = (px >> 8) & 0xFF
                r = (((px >> 16) & 0xFF) + g) & 0xFF
                b = ((px & 0xFF) + g) & 0xFF
                pixels[pos] = (px & 0xFF00FF00) | (r << 16) | b
        elif t[0] == 1:
            _apply_inverse_color_transform(pixels, xsize, h, t[1], t[2])
        elif t[0] == 0:
            _apply_inverse_predictor(pixels, xsize, h, t[1], t[2])
    return pixels


def decode_vp8l(data: bytes):
    """Decode a raw VP8L payload → (w, h, argb uint32 ndarray (h, w))."""
    if not data or data[0] != VP8L_MAGIC_BYTE:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(data)
    br.bits(8)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha-is-used hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    pixels, transforms = _decode_image_stream(br, w, h, True)
    pixels = _apply_inverse_transforms(pixels, w, h, transforms)
    arr = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
    return w, h, arr


def decode_webp_argb(blob: bytes):
    """RIFF/WEBP container → (w, h, argb uint32 (h, w)). VP8L only."""
    if len(blob) < 20 or blob[:4] != WEBP_RIFF or blob[8:12] != WEBP_FOURCC:
        raise ValueError("not a RIFF/WEBP container")
    riff_size = struct.unpack("<I", blob[4:8])[0]
    if riff_size + 8 > len(blob):
        raise ValueError("RIFF size overruns payload")
    pos = 12
    end = 8 + riff_size
    while pos + 8 <= end:
        fourcc = blob[pos:pos + 4]
        size = struct.unpack("<I", blob[pos + 4:pos + 8])[0]
        body = blob[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("chunk overruns payload")
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc in (b"VP8 ", b"VP8X"):
            raise ValueError(
                f"webp {fourcc.decode().strip()} (lossy/extended) "
                "unsupported — VP8L lossless only"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in WEBP container")


def decode_webp_gray(blob: bytes):
    """RIFF/WEBP → (w, h, uint8 (h, w)) from the GREEN channel — the
    channel our grayscale encoder carries pixels in (and equal to R/B
    for genuinely gray images).

    VP8L payloads decode via the from-scratch decoder above; lossy
    VP8 / extended VP8X payloads dispatch to the system libwebp
    (sources/webp_sys.py) when it is loadable. Without the library
    they fall through to ``decode_webp_argb``, whose distinct
    ValueError the integrity check maps to ``codec_unavailable``."""
    head = bytes(blob[:16])
    if (len(head) == 16 and head[:4] == WEBP_RIFF
            and head[8:12] == WEBP_FOURCC
            and head[12:16] in (b"VP8 ", b"VP8X")):
        from . import webp_sys

        if webp_sys.available():
            return webp_sys.decode_gray(blob)
    w, h, argb = decode_webp_argb(blob)
    return w, h, ((argb >> 8) & 0xFF).astype(np.uint8)


# ------------------------------------------------------------- encoder ---


def _write_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Full (non-simple) prefix code transmission: code-length code +
    per-symbol lengths, trailing zeros trimmed via the token cap."""
    last = max(i for i, ln in enumerate(lengths) if ln)
    tokens = lengths[: last + 1]
    # code-length code over the lengths we actually emit
    cl_hist = [0] * 19
    for ln in tokens:
        cl_hist[ln] += 1
    cl_lengths = _huffman_lengths(cl_hist, max_len=7)
    if sum(1 for x in cl_lengths if x) == 1:
        # complete the degenerate one-symbol CL tree with a dummy
        lone = next(i for i, x in enumerate(cl_lengths) if x)
        cl_lengths[lone] = 1
        cl_lengths[0 if lone != 0 else 1] = 1
    bw.write(0, 1)  # not a simple code
    # emit all 19 CL lengths in transmission order (3 bits each)
    bw.write(19 - 4, 4)
    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    cl_codes = _canonical_codes(cl_lengths)
    # token-count cap so the decoder stops after our last symbol
    n_tokens = len(tokens)
    nbits_choice = next(
        i for i in range(8) if n_tokens - 2 < (1 << (2 + 2 * i))
    )
    bw.write(1, 1)
    bw.write(nbits_choice, 3)
    bw.write(n_tokens - 2, 2 + 2 * nbits_choice)
    for ln in tokens:
        code, cln = cl_codes[ln]
        for i in range(cln - 1, -1, -1):  # msb-first
            bw.write((code >> i) & 1, 1)


def _huffman_lengths(hist: list[int], max_len: int = _MAX_CODE_LENGTH
                     ) -> list[int]:
    """Length-limited Huffman code lengths from a histogram (package-
    merge-free: plain Huffman then spill any overlong codes — fixture
    alphabets never get near the limit)."""
    import heapq

    items = [(f, i) for i, f in enumerate(hist) if f]
    if not items:
        return [0] * len(hist)
    if len(items) == 1:
        out = [0] * len(hist)
        out[items[0][1]] = 1
        return out
    heap = [(f, (i,)) for f, i in items]
    heapq.heapify(heap)
    depth = {i: 0 for _, i in items}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    if max(depth.values()) > max_len:
        raise ValueError("fixture alphabet produced overlong code")
    out = [0] * len(hist)
    for i, d in depth.items():
        out[i] = d
    return out


def _write_simple_code(bw: _BitWriter, symbols: list[int]) -> None:
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    if symbols[0] > 1:
        bw.write(1, 1)
        bw.write(symbols[0], 8)
    else:
        bw.write(0, 1)
        bw.write(symbols[0], 1)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def encode_vp8l_gray(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 → raw VP8L payload. Plain spec-conformant stream:
    no transforms, no cache, single prefix group, gray in GREEN,
    constant zero R/B, constant 255 alpha (all zero-bit codes)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2 or not px.size:
        raise ValueError("expected a non-empty (h, w) uint8 array")
    h, w = px.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dims out of VP8L 14-bit range")
    bw = _BitWriter()
    bw.write(VP8L_MAGIC_BYTE, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    flat = px.ravel()
    hist = np.bincount(flat, minlength=256).tolist() + [0] * 24
    used = [i for i, f in enumerate(hist) if f]
    if len(used) <= 2:
        _write_simple_code(bw, used)
        green_codes = _canonical_codes(
            [1 if i in used else 0 for i in range(280)]
        )
        if len(used) == 1:
            green_codes[used[0]] = (0, 0)  # lone symbol: zero bits
    else:
        lengths = _huffman_lengths(hist)
        _write_code_lengths(bw, lengths)
        green_codes = _canonical_codes(lengths)
    _write_simple_code(bw, [0])    # red: constant 0, zero-bit
    _write_simple_code(bw, [0])    # blue
    _write_simple_code(bw, [255])  # alpha
    _write_simple_code(bw, [0])    # distance (never used)
    for v in flat.tolist():
        code, ln = green_codes[v]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)
    return bw.done()


def encode_webp_gray(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 → complete RIFF/WEBP (VP8L) file bytes."""
    payload = encode_vp8l_gray(pixels)
    pad = b"\x00" if len(payload) % 2 else b""
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + pad
    return (WEBP_RIFF + struct.pack("<I", 4 + len(chunk)) + WEBP_FOURCC
            + chunk)
