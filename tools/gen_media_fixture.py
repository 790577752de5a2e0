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
