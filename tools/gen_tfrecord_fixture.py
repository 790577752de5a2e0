#!/usr/bin/env python3
"""Generate deterministic TFRecord fixtures for the training-container scan.

TFRecord framing (public spec, tensorflow/core/lib/io/record_writer.h):
    u64 LE  length
    u32 LE  masked crc32c of the 8 length bytes
    bytes   payload (a serialized tf.train.Example protobuf)
    u32 LE  masked crc32c of the payload
    mask(c) = ((c >> 15) | (c << 17)) + 0xa282ead8   (mod 2^32)

Payloads are hand-encoded tf.train.Example messages (proto wire format —
no tensorflow/protobuf dependency), one per record:
    features { feature { key: "id"  value { int64_list { value: [gid] } } }
               feature { key: "x"   value { int64_list { value: [x0..x3] } } }
               feature { key: "txt" value { bytes_list { value: ["doc-<gid>"] } } } }
with x_k = (gid * 2654435761 + 97 * k) % 1000 — every field replayable by
the DuckDB oracle with range() arithmetic.

Layout: 3 shards x 8 records, gid = shard * 8 + r.
"""
import os
import struct

K = 2654435761

# ---- crc32c (Castagnoli), bit-reflected, poly 0x82F63B78 ----
_tbl = []
for n in range(256):
    c = n
    for _ in range(8):
        c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
    _tbl.append(c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked(c: int) -> int:
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---- minimal proto wire encoding ----
def varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def ld(field: int, payload: bytes) -> bytes:  # length-delimited field
    return varint((field << 3) | 2) + varint(len(payload)) + payload


def int64_list(values) -> bytes:  # Int64List{ repeated int64 value=1 packed }
    packed = b"".join(varint(v) for v in values)
    return ld(1, packed)


def bytes_list(values) -> bytes:  # BytesList{ repeated bytes value=1 }
    return b"".join(ld(1, v) for v in values)


def feature_int64(values) -> bytes:  # Feature{ Int64List int64_list=3 }
    return ld(3, int64_list(values))


def feature_bytes(values) -> bytes:  # Feature{ BytesList bytes_list=1 }
    return ld(1, bytes_list(values))


def map_entry(key: str, feat: bytes) -> bytes:  # map<string,Feature> entry
    return ld(1, key.encode()) + ld(2, feat)


def example(gid: int) -> bytes:
    xs = [(gid * K + 97 * k) % 1000 for k in range(4)]
    features = (ld(1, map_entry("id", feature_int64([gid])))
                + ld(1, map_entry("x", feature_int64(xs)))
                + ld(1, map_entry("txt",
                                  feature_bytes([b"doc-%d" % gid]))))
    return ld(1, features)  # Example{ Features features=1 }


def record(payload: bytes) -> bytes:
    length = struct.pack("<Q", len(payload))
    return (length + struct.pack("<I", masked(crc32c(length)))
            + payload + struct.pack("<I", masked(crc32c(payload))))


out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "tfrecord")
os.makedirs(out, exist_ok=True)
for shard in range(3):
    with open(os.path.join(out, "shard_%d.tfrecord" % shard), "wb") as fh:
        for r in range(8):
            fh.write(record(example(shard * 8 + r)))
print("wrote 3 shards x 8 records")
