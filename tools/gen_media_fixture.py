#!/usr/bin/env python3
"""Generate deterministic binary-media fixtures for the multimodal queries.

Every payload byte/sample is a pure function of (file id, flat index), so the
DuckDB oracle can replay the decoded content with range() arithmetic while
Spark decodes the actual container bytes — a hash match proves every byte of
the header parse + payload decode path (the same replayable trick as the NPZ
fixtures).

  images  img_<i>.ppm  (i in 0..23)  P6 binary PPM, maxval 255
      width  w(i) = 8 + (i % 3) * 4      (8, 12, 16)
      height h(i) = 6 + (i % 2) * 4      (6, 10)
      RGB-interleaved payload byte at flat index f (channel = f % 3):
          p(i, f) = (f * 2654435761 + 97 * i) % 256
      every 5th file carries a '# comment' header line (parser must skip)

  audio   snd_<j>.wav  (j in 0..7)   RIFF/WAVE, PCM16 mono @ 8000 Hz
      n(j) = 64 + 16 * j samples
      s(j, t) = ((t * 2654435761 + 131 * j) % 4096) - 2048
      odd j carries a LIST chunk before data (parser must skip chunks)

  images  bmp_<i>.bmp  (i in 0..11)  24-bit uncompressed BMP
      width  w(i) = 7 + (i % 3) * 4      (7, 11, 15 — never 4-aligned,
                                          so every row carries pad bytes)
      height h(i) = 6 + (i % 2) * 4      (6, 10)
      pixel value in IMAGE order (row-major top-down, RGB-interleaved,
      flat index f = (y*w + x)*3 + ch):
          p(i, f) = (f * 2654435761 + 211 * i) % 256
      the FILE stores rows bottom-up in BGR with zero padding; odd i is
      written top-down (negative biHeight) — the decoder must handle both
"""
import os
import struct

K = 2654435761

out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "media")
os.makedirs(out, exist_ok=True)

for i in range(24):
    w = 8 + (i % 3) * 4
    h = 6 + (i % 2) * 4
    header = b"P6\n"
    if i % 5 == 0:
        header += ("# fixture %d\n" % i).encode()
    header += ("%d %d\n255\n" % (w, h)).encode()
    payload = bytes(((f * K + 97 * i) % 256) for f in range(w * h * 3))
    with open(os.path.join(out, "img_%02d.ppm" % i), "wb") as fh:
        fh.write(header + payload)

for j in range(8):
    n = 64 + 16 * j
    samples = [((t * K + 131 * j) % 4096) - 2048 for t in range(n)]
    data = struct.pack("<%dh" % n, *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if j % 2 == 1:  # extra chunk the parser must skip
        info = b"INFOfixture " + str(j).encode()
        if len(info) % 2:
            info += b"\x00"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    chunks += b"data" + struct.pack("<I", len(data)) + data
    riff = b"WAVE" + chunks
    with open(os.path.join(out, "snd_%d.wav" % j), "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)

for i in range(12):
    w = 7 + (i % 3) * 4
    h = 6 + (i % 2) * 4
    row_size = (w * 3 + 3) // 4 * 4
    top_down = i % 2 == 1
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)  # file row order
    for y in ys:
        row = bytearray()
        for x in range(w):
            base = (y * w + x) * 3
            r, g, b = (((base + ch) * K + 211 * i) % 256 for ch in range(3))
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    payload = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, 24, 0, len(payload), 2835, 2835, 0, 0)
    filehdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(payload), 0, 0, 54)
    with open(os.path.join(out, "bmp_%02d.bmp" % i), "wb") as fh:
        fh.write(filehdr + info + payload)

print("wrote", len(os.listdir(out)), "files to", out)

# images gif_<i>.gif (i in 0..11): GIF89a, 256-color palette, real LZW
#     width  w(i) = 6 + (i % 3) * 4      (6, 10, 14)
#     height h(i) = 6 + (i % 2) * 4      (6, 10)
#     palette byte (k*3 + c):  ((k*3 + c) * K + 83 * i) % 256
#     pixel index at q = y*w + x (top-down): idx(q) = (q * K + 241 * i) % 256
#     → decoded RGB at flat f = q*3 + c: ((idx(f//3)*3 + c) * K + 83*i) % 256
#     odd i is INTERLACED (4-pass row order on disk); i % 4 == 2 carries the
#     real palette in a LOCAL color table with a zeroed global one (the
#     decoder must prefer local); i % 3 == 0 leads with a Graphic Control
#     Extension block the parser must skip.


def _lzw_encode(data, min_code_size):
    """GIF LZW, width schedule in lockstep with MediaCodecs.lzwDecode: the
    width for the NEXT code grows when the entry count reaches 2^code_size,
    checked after each emit BEFORE that emit's dictionary add."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    state = {"acc": 0, "bits": 0, "size": min_code_size + 1, "free": eoi + 1}

    def put(code):
        state["acc"] |= code << state["bits"]
        state["bits"] += state["size"]
        while state["bits"] >= 8:
            out.append(state["acc"] & 0xFF)
            state["acc"] >>= 8
            state["bits"] -= 8
        if state["size"] < 12 and state["free"] >= (1 << state["size"]):
            state["size"] += 1

    put(clear)
    table = {}
    cur = data[0]
    for b in data[1:]:
        if (cur, b) in table:
            cur = table[(cur, b)]
        else:
            put(cur)
            if state["free"] < 4096:
                table[(cur, b)] = state["free"]
                state["free"] += 1
            else:
                put(clear)
                table.clear()
                state["size"] = min_code_size + 1
                state["free"] = eoi + 1
            cur = b
    put(cur)
    put(eoi)
    if state["bits"]:
        out.append(state["acc"] & 0xFF)
    return bytes(out)


for i in range(12):
    w = 6 + (i % 3) * 4
    h = 6 + (i % 2) * 4
    interlaced = i % 2 == 1
    local = i % 4 == 2
    palette = bytes(((p * K + 83 * i) % 256) for p in range(256 * 3))
    indices = bytes(((q * K + 241 * i) % 256) for q in range(w * h))
    if interlaced:  # 4-pass row order on disk
        ys = ([y for y in range(0, h, 8)] + [y for y in range(4, h, 8)]
              + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)])
    else:
        ys = range(h)
    stream = b"".join(indices[y * w:(y + 1) * w] for y in ys)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HH", w, h)
    gif += bytes((0x80 | 0x07, 0, 0))  # global table present, 256 entries
    gif += bytes(256 * 3) if local else palette
    if i % 3 == 0:  # GCE extension the parser must skip
        gif += bytes((0x21, 0xF9, 4, 0, 0, 0, 0, 0))
    gif += bytes((0x2C,)) + struct.pack("<HHHH", 0, 0, w, h)
    gif += bytes(((0x80 | 0x07 if local else 0) | (0x40 if interlaced else 0),))
    if local:
        gif += palette
    gif += bytes((8,))  # LZW root size
    lzw = _lzw_encode(stream, 8)
    for off in range(0, len(lzw), 255):
        block = lzw[off:off + 255]
        gif += bytes((len(block),)) + block
    gif += bytes((0, 0x3B))
    with open(os.path.join(out, "gif_%02d.gif" % i), "wb") as fh:
        fh.write(bytes(gif))

print("wrote", len(os.listdir(out)), "files to", out)

# images qoi_<i>.qoi (i in 0..11): QOI (qoiformat.org), RGB, spec's greedy
#     encoder (run / index-cache / wrapping diff / luma / rgb ops)
#     width  w(i) = 6 + (i % 3) * 4, height h(i) = 6 + (i % 2) * 4
#     pixels come in RUN GROUPS of 4 (gg = q // 4), on a 4-value grid whose
#     step depends on the ZONE (gg%8 >= 4 -> x32 steps, else x2), and every
#     gg%4==3 group REPEATS group gg-2's color (src = gg - 2):
#         src(gg) = gg - 2*(1 if gg%4==3 else 0)
#         mult(gg) = 32 if gg%8 >= 4 else 2
#         p(i, f) = (((src*12 + c) * K + 151*i) % 4) * mult + c
#     run groups exercise QOI_OP_RUN; repeated colors hit the 64-entry cache
#     (QOI_OP_INDEX); small-zone deltas land in DIFF/LUMA; big-zone and
#     zone-transition deltas fall through to RGB.


def _qoi_encode(w, h, rgb):
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, 3, 0))
    cache = [0] * 64
    pr = pg = pb = 0
    run = 0
    for q in range(w * h):
        r, g, b = rgb[q * 3], rgb[q * 3 + 1], rgb[q * 3 + 2]
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
        packed = (r << 24) | (g << 16) | (b << 8) | 255
        if cache[idx] == packed:
            out.append(idx)
        else:
            cache[idx] = packed
            d8 = lambda x: ((x + 128) & 0xFF) - 128
            dr, dg, db = d8(r - pr), d8(g - pg), d8(b - pb)
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


for i in range(12):
    w = 6 + (i % 3) * 4
    h = 6 + (i % 2) * 4
    rgb = bytearray()
    for q in range(w * h):
        gg = q // 4
        src = gg - 2 * (1 if gg % 4 == 3 else 0)
        mult = 32 if gg % 8 >= 4 else 2
        for c in range(3):
            rgb.append((((src * 12 + c) * K + 151 * i) % 4) * mult + c)
    with open(os.path.join(out, "qoi_%02d.qoi" % i), "wb") as fh:
        fh.write(_qoi_encode(w, h, bytes(rgb)))

print("wrote", len(os.listdir(out)), "files to", out)

# images png_<i>.png (i in 0..11): 8-bit truecolor (type 2) PNG, zlib-deflated
#     width  w(i) = 5 + (i % 3) * 4      (5, 9, 13)
#     height h(i) = 6 + (i % 2) * 4      (6, 10)
#     pixel value in IMAGE order (row-major top-down, RGB, f = (y*w+x)*3+ch):
#         p(i, f) = (f * 2654435761 + 229 * i) % 256
#     row y is stored with PNG filter type (i + y) % 5 — every file exercises
#     all five filters (None/Sub/Up/Average/Paeth); i % 3 == 0 carries a tEXt
#     ancillary chunk the parser must skip; odd i splits IDAT into two chunks
#     the parser must concatenate before inflating.
import zlib

def _png_chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c

for i in range(12):
    w = 5 + (i % 3) * 4
    h = 6 + (i % 2) * 4
    raw = [bytes(((((y * w + x) * 3 + ch) * K + 229 * i) % 256
                  for x in range(w) for ch in range(3)))
           for y in range(h)]
    stream = bytearray()
    prior = bytes(w * 3)
    for y, row in enumerate(raw):
        ft = (i + y) % 5
        stream.append(ft)
        for x in range(w * 3):
            left = row[x - 3] if x >= 3 else 0
            up = prior[x]
            ul = prior[x - 3] if x >= 3 else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - left
            elif ft == 2:
                v = row[x] - up
            elif ft == 3:
                v = row[x] - (left + up) // 2
            else:
                v = row[x] - _paeth(left, up, ul)
            stream.append(v & 0xFF)
        prior = row
    idat = zlib.compress(bytes(stream), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if i % 3 == 0:
        png += _png_chunk(b"tEXt", b"Comment\x00fixture %d" % i)
    if i % 2 == 1 and len(idat) > 2:
        cut = len(idat) // 2
        png += _png_chunk(b"IDAT", idat[:cut]) + _png_chunk(b"IDAT", idat[cut:])
    else:
        png += _png_chunk(b"IDAT", idat)
    png += _png_chunk(b"IEND", b"")
    with open(os.path.join(out, "png_%02d.png" % i), "wb") as fh:
        fh.write(png)

print("wrote", len(os.listdir(out)), "files to", out)

# audio flac_<j>.flac (j in 0..7): FLAC (RFC 9639 subset), 16-bit, block 64
#     channels c(j) = 1 + (j % 2)            (odd j stereo)
#     per-channel samples m(j) = 48 + 16*j   (48..160 — partial/multi frames)
#     INTERLEAVED sample t in 0..c*m-1:  s(j,t) = ((t*K + 157*j) % 4096) - 2048
#     fixed predictor order per (frame f, ch) = (j + f + ch) % 5 (clamped)
#     stereo mode per frame = (j + f) % 4  (independent, left/side,
#     right/side, mid/side — the decoder must undo all four decorrelations)
#     rice partition order = j % 3 (clamped to divide the block size);
#     j == 3 writes ESCAPE partitions (fixed-width raw residuals) instead
#     of rice; odd j leads with PADDING + APPLICATION metadata blocks the
#     parser must skip. The oracle replays only the SAMPLE formula — every
#     container choice above changes the bytes but not the decoded PCM.


def _flac_crc8(data):
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data):
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc & 0xFF)
                self.acc = 0
                self.n = 0

    def put_signed(self, v, n):
        self.put(v & ((1 << n) - 1), n)

    def put_unary(self, q):
        self.put(1, q + 1)  # q zeros then a one

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)


def _flac_subframe(w, s, bps, order, po, escape):
    w.put(0, 1)  # padding
    order = max(0, min(order, 4, len(s) - 1))
    w.put(0x08 | order, 6)  # FIXED
    w.put(0, 1)  # no wasted bits
    for i in range(order):
        w.put_signed(s[i], bps)
    res = []
    for i in range(order, len(s)):
        p = (0 if order == 0 else s[i - 1] if order == 1
             else 2 * s[i - 1] - s[i - 2] if order == 2
             else 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3] if order == 3
             else 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3] - s[i - 4])
        res.append(s[i] - p)
    while po > 0 and (len(s) % (1 << po) != 0 or (len(s) >> po) < order):
        po -= 1
    w.put(0, 2)  # rice method 0 (4-bit params)
    w.put(po, 4)
    start = 0
    for p in range(1 << po):
        cnt = (len(s) >> po) - (order if p == 0 else 0)
        part = res[start:start + cnt]
        if escape:
            raw = max((v.bit_length() + 1 for v in part), default=1)
            w.put(15, 4)
            w.put(raw, 5)
            for v in part:
                w.put(v & ((1 << raw) - 1), raw)
        else:
            best, cost = 0, None
            for param in range(15):
                c = sum((((v << 1) ^ (v >> 63)) >> param) + 1 + param for v in part)
                if cost is None or c < cost:
                    best, cost = param, c
            w.put(best, 4)
            for v in part:
                z = (v << 1) ^ (v >> 63)
                w.put_unary(z >> best)
                if best:
                    w.put(z & ((1 << best) - 1), best)
        start += cnt


for j in range(8):
    ch = 1 + (j % 2)
    m = 48 + 16 * j
    inter = [((t * K + 157 * j) % 4096) - 2048 for t in range(ch * m)]
    bs = 64
    info = _Bits()
    last_bs = m % bs or bs
    info.put(min(bs, last_bs), 16)
    info.put(bs, 16)
    info.put(0, 24)
    info.put(0, 24)
    info.put(8000, 20)
    info.put(ch - 1, 3)
    info.put(15, 5)
    info.put(m, 36)
    for _ in range(16):
        info.put(0, 8)
    flac = bytearray(b"fLaC")
    if j % 2 == 1:  # metadata blocks the parser must skip
        flac += bytes((1, 0, 0, 4)) + bytes(4)  # PADDING
        app = b"fixtfixture %d" % j
        flac += bytes((2, 0, 0, len(app))) + app  # APPLICATION
    flac += bytes((0x80, 0, 0, len(info.out))) + info.out
    n_frames = (m + bs - 1) // bs
    for f in range(n_frames):
        off = f * bs
        n = min(bs, m - off)
        hdr = _Bits()
        hdr.put(0x3FFE, 14)
        hdr.put(0, 2)  # reserved + fixed-blocksize strategy
        hdr.put(7, 4)  # block size: 16-bit value-1 at header end
        hdr.put(0, 4)  # sample rate: from STREAMINFO
        mode = (j + f) % 4 if ch == 2 else -1
        hdr.put({1: 8, 2: 9, 3: 10}.get(mode, ch - 1), 4)
        hdr.put(4, 3)  # sample size: 16
        hdr.put(0, 1)
        hdr.put(f, 8)  # UTF-8 frame number (single byte)
        hdr.put(n - 1, 16)
        hdr.align()
        frame = bytearray(hdr.out)
        frame.append(_flac_crc8(frame))
        body = _Bits()
        if ch == 1:
            _flac_subframe(body, inter[off:off + n], 16, (j + f) % 5,
                           j % 3, j == 3)
        else:
            left = inter[2 * off:2 * (off + n):2]
            right = inter[2 * off + 1:2 * (off + n):2]
            if mode == 1:
                c0, c1, b0, b1 = left, [l - r for l, r in zip(left, right)], 16, 17
            elif mode == 2:
                c0, c1, b0, b1 = [l - r for l, r in zip(left, right)], right, 17, 16
            elif mode == 3:
                c0 = [(l + r) >> 1 for l, r in zip(left, right)]
                c1 = [l - r for l, r in zip(left, right)]
                b0, b1 = 16, 17
            else:
                c0, c1, b0, b1 = left, right, 16, 16
            _flac_subframe(body, c0, b0, (j + f) % 5, j % 3, j == 3)
            _flac_subframe(body, c1, b1, (j + f + 1) % 5, j % 3, j == 3)
        body.align()
        frame += body.out
        crc16 = _flac_crc16(frame)
        frame += bytes(((crc16 >> 8) & 0xFF, crc16 & 0xFF))
        flac += frame
    with open(os.path.join(out, "flac_%d.flac" % j), "wb") as fh:
        fh.write(bytes(flac))

print("wrote", len(os.listdir(out)), "files to", out)

# video  vid_<v>.y4m  (v in 0..7)  YUV4MPEG2, C444 (full-res planes)
#     width  w(v) = 8 + (v % 3) * 4,  height h(v) = 6 + (v % 2) * 4
#     frames nf(v) = 6 + v % 5
#     plane byte at (frame t, plane p in {0=Y,1=U,2=V}, flat index f):
#         b(v, t, p, f) = (t * 131 + p * 17 + f * 2654435761 + 97 * v) % 256
#     odd v carries a parameter on each FRAME line (parser must skip to \n);
#     v % 4 == 0 carries an X-param in the stream header
for v in range(8):
    w = 8 + (v % 3) * 4
    h = 6 + (v % 2) * 4
    nf = 6 + v % 5
    hdr = "YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444" % (w, h)
    if v % 4 == 0:
        hdr += " Xfixture%d" % v
    data = bytearray(hdr.encode() + b"\n")
    for t in range(nf):
        fl = "FRAME"
        if v % 2 == 1:
            fl += " Xt%d" % t
        data += fl.encode() + b"\n"
        for p in range(3):
            data += bytes(((t * 131 + p * 17 + f * K + 97 * v) % 256)
                          for f in range(w * h))
    with open(os.path.join(out, "vid_%d.y4m" % v), "wb") as fh:
        fh.write(bytes(data))

# video  vid420_<v>.y4m  (v in 0..5)  YUV4MPEG2, C420 (4:2:0 subsampled
#     chroma — the dominant real-world interchange layout; the decoder
#     upsamples to full-res planes on read, so downstream sums are exactly
#     4x the subsampled chroma bytes)
#     width  w(v) = 8 + (v % 3) * 4  (8, 12, 16 — all even)
#     height h(v) = 6 + (v % 2) * 4  (6, 10 — all even)
#     frames nf(v) = 5 + v % 4
#     Y plane byte (flat f in [0, w*h)):        (t*131 + f*K + 59*v) % 256
#     U/V plane byte (p in {1,2}, f in [0, (w/2)*(h/2))):
#         (t*131 + p*17 + f*K + 59*v) % 256
#     v % 3 == 1 uses the C420jpeg siting alias (same plane layout);
#     odd v carries a FRAME-line param (parser must skip to \n)
for v in range(6):
    w = 8 + (v % 3) * 4
    h = 6 + (v % 2) * 4
    nf = 5 + v % 4
    ctag = "C420jpeg" if v % 3 == 1 else "C420"
    hdr = "YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s" % (w, h, ctag)
    data = bytearray(hdr.encode() + b"\n")
    for t in range(nf):
        fl = "FRAME"
        if v % 2 == 1:
            fl += " Xt%d" % t
        data += fl.encode() + b"\n"
        data += bytes(((t * 131 + f * K + 59 * v) % 256)
                      for f in range(w * h))
        for p in (1, 2):
            data += bytes(((t * 131 + p * 17 + f * K + 59 * v) % 256)
                          for f in range((w // 2) * (h // 2)))
    with open(os.path.join(out, "vid420_%d.y4m" % v), "wb") as fh:
        fh.write(bytes(data))

# images  jpg444_<i>.jpg (i in 0..11) and jpg420_<i>.jpg (i in 0..11)
#     BASELINE SEQUENTIAL JPEG (SOF0, 8-bit, custom canonical Huffman
#     tables, custom DQT with qDC=8). Every 8x8 block is CONSTANT in each
#     component and all AC coefficients are zero, so the decode is EXACT:
#     with qDC=8 the quantized DC is exactly (value-128) and the IDCT of a
#     DC-only block is flat — the decoded pixel replays from the block
#     formulas below with NO DCT arithmetic in the oracle. The bitstream
#     still crosses the full baseline path: marker/segment parse (APP0,
#     COM, DQT multi-table, DHT multi-table, DRI), canonical Huffman
#     decode, DC prediction + EXTEND, zigzag/dequant, IDCT, MCU layout
#     (interleaved 4:4:4 and 2x2-subsampled 4:2:0), right/bottom MCU crop,
#     restart-marker predictor resets, byte unstuffing, and the fixed-point
#     integer YCbCr->RGB conversion (libjpeg constants, documented in
#     MediaCodecs.decodeJpeg).
#
#     jpg444: wB = 2+(i%3) blocks, hB = 1+(i%2) blocks
#             w = 8*wB - 3*(i%2), h = 8*hB - 2*(1 if i%3==2 else 0)
#             per block (bx,by):
#               Y  = 48 + (97*i + 17*bx + 29*by) % 160
#               Cb = 126 + (i + bx + 2*by) % 5
#               Cr = 126 + (2*i + 3*bx + by) % 5
#             i%3==0 carries a COM segment; i%4==2 carries DRI=2 + RSTn
#     jpg420: mW = 1+(i%2) MCU cols, 1 MCU row
#             w = 16*mW - 5*(i%3), h = 16 - 6*(i%2)
#             Y per 8x8 block (bx,by): 48 + (89*i + 13*bx + 23*by) % 160
#             Cb per MCU cx: 126 + (i + cx) % 5
#             Cr per MCU cx: 126 + (2*i + cx) % 5
#             i%3==0 carries a COM segment; i%4==1 carries DRI=1 + RSTn

def _jpeg_tables():
    # DC: categories 0..8, all 4-bit codes (no all-ones); AC: EOB only, 2-bit
    dc_bits = [0, 0, 0, 9] + [0] * 12
    dc_vals = list(range(9))
    ac_bits = [0, 1] + [0] * 14
    ac_vals = [0x00]
    return dc_bits, dc_vals, ac_bits, ac_vals

def _canon_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0
    def put(self, value, length):
        for b in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0
    def pad(self):
        while self.n:
            self.put(1, 1)
    def marker(self, m):
        self.pad()
        self.out += bytes([0xFF, m])

def _dc_encode(bw, codes, diff):
    t, a = 0, abs(diff)
    while a:
        t += 1
        a >>= 1
    c, ln = codes[t]
    bw.put(c, ln)
    if t:
        bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)

def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

def _jpeg_headers(w, h, samp_y, com, dri):
    dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_tables()
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if com is not None:
        out += _seg(0xFE, com.encode())
    # one DQT segment, two tables (multi-table loop)
    q_luma = bytes([8] + [16] * 63)
    q_chroma = bytes([8] + [17] * 63)
    out += _seg(0xDB, b"\x00" + q_luma + b"\x01" + q_chroma)
    # one DHT segment, four tables: DC0, AC0, DC1, AC1
    def ht(tc_th, bits, vals):
        return bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, ht(0x00, dc_bits, dc_vals) + ht(0x10, ac_bits, ac_vals)
                + ht(0x01, dc_bits, dc_vals) + ht(0x11, ac_bits, ac_vals))
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, samp_y, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _seg(0xC0, sof)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _seg(0xDA, sos)
    return out

dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_tables()
DC_CODES = _canon_codes(dc_bits, dc_vals)
AC_EOB = _canon_codes(ac_bits, ac_vals)[0x00]

def _write_jpeg(path, w, h, samp_y, mcus, com, dri):
    """mcus: list of MCUs; each MCU a list of (comp_idx, block_value)."""
    out = bytearray(_jpeg_headers(w, h, samp_y, com, dri))
    bw = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    for k, mcu in enumerate(mcus):
        if dri and k and k % dri == 0:
            bw.marker(0xD0 + rst)
            rst = (rst + 1) % 8
            pred = [0, 0, 0]
        for comp, val in mcu:
            c = val - 128  # qDC = 8 makes the quantized DC exactly this
            _dc_encode(bw, DC_CODES, c - pred[comp])
            pred[comp] = c
            bw.put(*AC_EOB)  # all-zero AC
    bw.pad()
    data = bytes(out) + bytes(bw.out) + b"\xff\xd9"
    with open(path, "wb") as fh:
        fh.write(data)

for i in range(12):
    wB, hB = 2 + (i % 3), 1 + (i % 2)
    w = 8 * wB - 3 * (i % 2)
    h = 8 * hB - (2 if i % 3 == 2 else 0)
    mcus = []
    for by in range(hB):
        for bx in range(wB):
            mcus.append([
                (0, 48 + (97 * i + 17 * bx + 29 * by) % 160),
                (1, 126 + (i + bx + 2 * by) % 5),
                (2, 126 + (2 * i + 3 * bx + by) % 5)])
    _write_jpeg(os.path.join(out, "jpg444_%02d.jpg" % i), w, h, 0x11, mcus,
                com=("fixture %d" % i) if i % 3 == 0 else None,
                dri=2 if i % 4 == 2 else 0)

for i in range(12):
    mW = 1 + (i % 2)
    w = 16 * mW - 5 * (i % 3)
    h = 16 - 6 * (i % 2)
    mcus = []
    for cx in range(mW):
        blocks = []
        for sy in range(2):
            for sx in range(2):
                bx, by = 2 * cx + sx, sy
                blocks.append((0, 48 + (89 * i + 13 * bx + 23 * by) % 160))
        blocks.append((1, 126 + (i + cx) % 5))
        blocks.append((2, 126 + (2 * i + cx) % 5))
        mcus.append(blocks)
    _write_jpeg(os.path.join(out, "jpg420_%02d.jpg" % i), w, h, 0x22, mcus,
                com=("fixture %d" % i) if i % 3 == 0 else None,
                dri=1 if i % 4 == 1 else 0)

# images  jpgprog_<i>.jpg (i in 0..9)
#     PROGRESSIVE-HUFFMAN JPEG (SOF2, 8-bit, 4:4:4) in the SAME DC-only
#     exact subspace as jpg444 (constant blocks, qDC=8), so the decoded
#     pixels replay from the block formulas while the bitstream crosses
#     the full T.81 annex-G machinery: an interleaved DC first scan at
#     Al=1 (arithmetic-shifted diffs), a DC refinement scan (one raw bit
#     per block at position 0), per-component AC band scans Ss=1..Se=63
#     at Al=1 coded as pure EOBRUN (EOBn symbols with extension bits),
#     and per-component AC refinement scans (Ah=1, Al=0 — EOBRUN again,
#     zero correction bits since the band is empty). Scan ORDER varies
#     (odd i refines DC before the AC scans), i%3==1 SPLITS the AC band
#     into two scans per component (1..5 then 6..63 — the libjpeg-style
#     progression-script shape), i%5==0 redefines the DHT between scans,
#     i%3==0 carries a COM, and i%4==2 carries DRI=2 with RSTn resets in
#     EVERY scan (EOB runs never straddle a restart).
#
#     wB = 2+(i%3) blocks, hB = 1+(i%2) blocks
#     w = 8*wB - 3*(i%2), h = 8*hB - 2*(1 if i%3==2 else 0)
#     per block (bx,by):
#       Y  = 48 + (101*i + 19*bx + 31*by) % 160
#       Cb = 126 + (3*i + bx + by) % 5
#       Cr = 126 + (i + 2*bx + 3*by) % 5

PROG_AC_BITS = [0, 0, 4] + [0] * 13
PROG_AC_VALS = [0x00, 0x10, 0x20, 0x30]  # EOB runs of 1, 2-3, 4-7, 8-15
PROG_AC = _canon_codes(PROG_AC_BITS, PROG_AC_VALS)

def _eob_encode(bw, n):
    # EOBRUN covering n blocks: symbol r<<4, r = floor(log2 n), then r
    # extension bits of n - 2^r
    r = n.bit_length() - 1
    c, ln = PROG_AC[r << 4]
    bw.put(c, ln)
    if r:
        bw.put(n - (1 << r), r)

def _sos(scomps, ss, se, ah, al):
    b = bytes([len(scomps)])
    for cid, td, ta in scomps:
        b += bytes([cid, (td << 4) | ta])
    b += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, b)

def _prog_dht():
    dc_bits, dc_vals, _, _ = _jpeg_tables()
    def ht(tc_th, bits, vals):
        return bytes([tc_th]) + bytes(bits) + bytes(vals)
    return _seg(0xC4, ht(0x00, dc_bits, dc_vals) + ht(0x01, dc_bits, dc_vals)
                + ht(0x10, PROG_AC_BITS, PROG_AC_VALS)
                + ht(0x11, PROG_AC_BITS, PROG_AC_VALS))

def _prog_headers(w, h, com, dri):
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if com is not None:
        out += _seg(0xFE, com.encode())
    q_luma = bytes([8] + [16] * 63)
    q_chroma = bytes([8] + [17] * 63)
    out += _seg(0xDB, b"\x00" + q_luma + b"\x01" + q_chroma)
    out += _prog_dht()
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x11, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _seg(0xC2, sof)
    return bytes(out)

def _scan_dc_first(dcs, al, dri):
    bw = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    for k, mcu in enumerate(dcs):
        if dri and k and k % dri == 0:
            bw.marker(0xD0 + rst)
            rst = (rst + 1) % 8
            pred = [0, 0, 0]
        for comp, c in enumerate(mcu):
            v = c >> al  # arithmetic shift: T.81's DC point transform
            _dc_encode(bw, DC_CODES, v - pred[comp])
            pred[comp] = v
    bw.pad()
    return bytes(bw.out)

def _scan_dc_refine(dcs, al, dri):
    bw = _BitWriter()
    rst = 0
    for k, mcu in enumerate(dcs):
        if dri and k and k % dri == 0:
            bw.marker(0xD0 + rst)
            rst = (rst + 1) % 8
        for comp, c in enumerate(mcu):
            bw.put((c >> al) & 1, 1)
    bw.pad()
    return bytes(bw.out)

def _scan_ac_zero(nblocks, dri):
    # all-zero band: pure EOBRUN, broken at restart boundaries (the
    # non-interleaved restart interval counts BLOCKS)
    bw = _BitWriter()
    rst = 0
    done = 0
    while done < nblocks:
        if dri and done and done % dri == 0:
            bw.marker(0xD0 + rst)
            rst = (rst + 1) % 8
        run = min(dri, nblocks - done) if dri else nblocks
        _eob_encode(bw, run)
        done += run
    bw.pad()
    return bytes(bw.out)

def _write_prog(path, w, h, blocks, com, dri, refine_dc_first, redef_dht,
                split_bands):
    dcs = [[yv - 128, cb - 128, cr - 128] for (yv, cb, cr) in blocks]
    nb = len(blocks)
    def sos_dc(ah, al):
        return _sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, ah, al)
    def sos_ac(cid, ss, se, ah, al):
        return _sos([(cid, 0, 0 if cid == 1 else 1)], ss, se, ah, al)
    # split_bands mirrors real encoders' progression scripts (libjpeg's
    # default splits the AC band, e.g. 1..5 then 6..63): per component,
    # one scan per band — the all-zero bands are still pure EOBRUN
    bands = [(1, 5), (6, 63)] if split_bands else [(1, 63)]
    dc1 = sos_dc(0, 1) + _scan_dc_first(dcs, 1, dri)
    dcr = sos_dc(1, 0) + _scan_dc_refine(dcs, 0, dri)
    ac1 = b"".join(sos_ac(cid, ss, se, 0, 1) + _scan_ac_zero(nb, dri)
                   for cid in (1, 2, 3) for (ss, se) in bands)
    acr = b"".join(sos_ac(cid, ss, se, 1, 0) + _scan_ac_zero(nb, dri)
                   for cid in (1, 2, 3) for (ss, se) in bands)
    mid = _prog_dht() if redef_dht else b""
    body = (dc1 + dcr + mid + ac1 + acr) if refine_dc_first \
        else (dc1 + ac1 + mid + dcr + acr)
    with open(path, "wb") as fh:
        fh.write(_prog_headers(w, h, com, dri) + body + b"\xff\xd9")

for i in range(10):
    wB, hB = 2 + (i % 3), 1 + (i % 2)
    w = 8 * wB - 3 * (i % 2)
    h = 8 * hB - (2 if i % 3 == 2 else 0)
    blocks = []
    for by in range(hB):
        for bx in range(wB):
            blocks.append((48 + (101 * i + 19 * bx + 31 * by) % 160,
                           126 + (3 * i + bx + by) % 5,
                           126 + (i + 2 * bx + 3 * by) % 5))
    _write_prog(os.path.join(out, "jpgprog_%02d.jpg" % i), w, h, blocks,
                com=("fixture %d" % i) if i % 3 == 0 else None,
                dri=2 if i % 4 == 2 else 0,
                refine_dc_first=(i % 2 == 1),
                redef_dht=(i % 5 == 0),
                split_bands=(i % 3 == 1))

# video  vid422_<v>.y4m  (v in 0..5)  YUV4MPEG2, C422 (4:2:2 subsampled
#     chroma — half WIDTH, full height: the broadcast/capture interchange
#     layout; the decoder upsamples 2x1 on read, so downstream chroma sums
#     are exactly 2x the subsampled bytes)
#     width  w(v) = 8 + (v % 3) * 4  (8, 12, 16 — all even)
#     height h(v) = 5 + (v % 2) * 4  (5, 9 — ODD on purpose: C422 needs
#                                     even width only)
#     frames nf(v) = 4 + v % 4
#     Y plane byte (flat f in [0, w*h)):        (t*131 + f*K + 71*v) % 256
#     U/V plane byte (p in {1,2}, f in [0, (w/2)*h)):
#         (t*131 + p*17 + f*K + 71*v) % 256
#     odd v carries a FRAME-line param; v % 4 == 0 carries an X header param
for v in range(6):
    w = 8 + (v % 3) * 4
    h = 5 + (v % 2) * 4
    nf = 4 + v % 4
    hdr = "YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C422" % (w, h)
    if v % 4 == 0:
        hdr += " Xfixture%d" % v
    data = bytearray(hdr.encode() + b"\n")
    for t in range(nf):
        fl = "FRAME"
        if v % 2 == 1:
            fl += " Xt%d" % t
        data += fl.encode() + b"\n"
        data += bytes(((t * 131 + f * K + 71 * v) % 256)
                      for f in range(w * h))
        for p in (1, 2):
            data += bytes(((t * 131 + p * 17 + f * K + 71 * v) % 256)
                          for f in range((w // 2) * h))
    with open(os.path.join(out, "vid422_%d.y4m" % v), "wb") as fh:
        fh.write(bytes(data))
