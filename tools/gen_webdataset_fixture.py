#!/usr/bin/env python3
"""Generate deterministic WebDataset tar-shard fixtures.

WebDataset (public convention, webdataset/webdataset): a training sample is
the group of adjacent tar members sharing a basename — here `<key>.ppm`
(image) + `<key>.txt` (caption), key = "%06d" % gid. POSIX ustar members,
zeroed mtime/uid/gid so shard bytes are deterministic.

Content is replayable arithmetic:
    image: P6 PPM, w = 8 + (gid % 3) * 4, h = 6 + (gid % 2) * 4,
           payload byte p(gid, f) = (f * 2654435761 + 149 * gid) % 256
    text:  "caption %d %d" % (gid, (gid * 7) % 100)

Layout: 2 shards x 8 samples, gid = shard * 8 + s.
"""
import io
import os
import tarfile

K = 2654435761

out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "webdataset")
os.makedirs(out, exist_ok=True)


def member(tar, name, data):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(data))


for shard in range(2):
    path = os.path.join(out, "shard_%d.tar" % shard)
    with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tar:
        for s in range(8):
            gid = shard * 8 + s
            w = 8 + (gid % 3) * 4
            h = 6 + (gid % 2) * 4
            ppm = (b"P6\n%d %d\n255\n" % (w, h)
                   + bytes(((f * K + 149 * gid) % 256) for f in range(w * h * 3)))
            txt = ("caption %d %d" % (gid, (gid * 7) % 100)).encode()
            member(tar, "%06d.ppm" % gid, ppm)
            member(tar, "%06d.txt" % gid, txt)
print("wrote 2 shards x 8 samples")
