#!/usr/bin/env python3
"""Generate deterministic Arrow IPC *stream* fixtures for the Arrow-ingest
queries.

Every value is a pure function of the GLOBAL row index f (file*24 + row
within file), so the DuckDB oracle replays the expected contents with
range() arithmetic instead of reading the archives (the q97/q166 trick):

  id  int64   : f
  val float64 : NULL when f % 7 == 0 (exercises validity bitmaps),
                else ((f * 2654435761) % 4096) / 16.0  — multiples of 1/16
                below 256, exactly representable, so decode parity is
                bit-exact
  tag utf8    : 'tag_' + str(f % 5)  (variable-width + offsets path)

Two files x 3 record batches x 8 rows: the reader must iterate batches
within a stream AND parallelize across files.
"""
import os

import pyarrow as pa
import pyarrow.ipc as ipc

K = 2654435761
out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "arrow")
os.makedirs(out, exist_ok=True)

schema = pa.schema([
    pa.field("id", pa.int64(), nullable=False),
    pa.field("val", pa.float64(), nullable=True),
    pa.field("tag", pa.utf8(), nullable=False),
])

for part in range(2):
    path = os.path.join(out, f"part-{part}.arrows")
    with ipc.new_stream(path, schema) as w:
        for batch in range(3):
            fs = [part * 24 + batch * 8 + i for i in range(8)]
            w.write_batch(pa.record_batch([
                pa.array(fs, pa.int64()),
                pa.array([None if f % 7 == 0 else ((f * K) % 4096) / 16.0
                          for f in fs], pa.float64()),
                pa.array([f"tag_{f % 5}" for f in fs], pa.utf8()),
            ], schema=schema))

print("wrote", sorted(os.listdir(out)))
