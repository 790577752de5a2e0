#!/usr/bin/env python3
"""Generate the deterministic .npz fixtures for the NPZ-ingest queries.

Every value is a pure function of its flat index, so the DuckDB oracle can
replay the expected contents with range() arithmetic instead of reading the
archive (the same replayable-hash trick as the custom DSv2 source / q87):

  matrices (24, 16, 16, 3) float32 : v[f] = ((f * 2654435761) % 4096) / 16
  features (24, 12)        float64 : col 0 = event_idx % 3 (the class label),
                                     else same formula on the flat index

All values are multiples of 1/16 below 256, hence exactly representable in
float32 — decode parity is bit-exact, never rounding-dependent.

matrices is written with savez_compressed (ZIP_DEFLATED) and features with
savez (ZIP_STORED) so the reader's zip handling is exercised on both methods.
"""
import os
import numpy as np

K = 2654435761  # Knuth's multiplicative hash constant

out = os.path.join(os.path.dirname(__file__), "..", "fixtures", "npz")
os.makedirs(out, exist_ok=True)

n_events, rows, cols, chans, n_feat = 24, 16, 16, 3, 12

f_mat = np.arange(n_events * rows * cols * chans, dtype=np.int64)
matrices = (((f_mat * K) % 4096) / 16.0).astype(np.float32) \
    .reshape(n_events, rows, cols, chans)

f_feat = np.arange(n_events * n_feat, dtype=np.int64)
features = (((f_feat * K) % 4096) / 16.0).reshape(n_events, n_feat)
features[:, 0] = np.arange(n_events) % 3  # class label column

np.savez_compressed(os.path.join(out, "demo_matrices.npz"), matrices=matrices)
np.savez(os.path.join(out, "demo_features.npz"), features=features)

print("wrote", sorted(os.listdir(out)),
      "matrices", matrices.shape, matrices.dtype,
      "features", features.shape, features.dtype)
