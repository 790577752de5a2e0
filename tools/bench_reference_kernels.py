#!/usr/bin/env python3
"""Measure the reference's single-node kernels (faithful numpy
re-implementations of its actual loops) at the engine's bench scale, so
BASELINE.md has real numbers to compare BENCH_r*.json against.

The reference itself cannot run here (sklearn/torch/astropy absent), but its
dataflow kernels are numpy: the survival-curve threshold loop
(evaluate_classification.py:126-133 — verbatim algorithm, including the
per-threshold full-array masks), rotation augmentation
(create_train_valid_test_datasets.py:72-77), spherical conversion
(to_XY_astropy, :96-101 — the astropy call reduces to these trig formulas),
and scaler fit/apply (train_classification.py:184-200; StandardScaler is
(x-mean)/std). Scalers are re-expressed in plain numpy — identical math.

Sizes mirror the engine's sf0.1 bench inputs (600k lineitem rows, 60k events
with 16x16 grids, 1.5M orders values) on the same machine, single process —
the reference has no parallelism story, which is exactly the point of the
comparison.
"""
import json
import time

import numpy as np

rng = np.random.default_rng(42)
results = {}


def bench(name, f, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    results[name] = min(ts)
    print(f"{name:34s} {min(ts):8.2f} s")


# 1. survival curve — the reference's VERBATIM O(N·bins) threshold loop
#    (evaluate_classification.py:126-133) at q07's sf0.1 input size.
N_curve = 480_000
preds = rng.random(N_curve)
y = (rng.random(N_curve) < 0.5).astype(np.int64)
prob_bins = np.linspace(0, 1, 10_001)


def survival_reference_loop():
    cpg, ipp = [], []
    for right_edge in prob_bins[1:]:
        cond = np.where((y == 0) & (preds < right_edge))
        cpg.append(y[cond].shape[0])
        cond = np.where((y == 1) & (preds < right_edge))
        ipp.append(y[cond].shape[0])
    return cpg, ipp


def survival_vectorized():  # the best-case numpy rewrite, for fairness
    h0, _ = np.histogram(preds[y == 0], bins=prob_bins)
    h1, _ = np.histogram(preds[y == 1], bins=prob_bins)
    return np.cumsum(h0), np.cumsum(h1)


bench("survival_curve reference loop", survival_reference_loop, reps=1)
bench("survival_curve numpy-vectorized", survival_vectorized)

# 2. rotation augmentation — np.rot90 over the event grids + the feature
#    rewrite, 3 rotations of a 30% sample (create_train_valid_test_datasets
#    generate_rotations), 60k events of 16x16.
mats = rng.random((60_000, 16, 16)).astype(np.float32)
feats = rng.random((60_000, 12))


def rotation_augmentation():
    out_m, out_f = [mats], [feats]
    for k in (1, 2, 3):
        idx = rng.integers(0, mats.shape[0], size=int(mats.shape[0] * 0.3))
        out_m.append(np.rot90(mats, k, axes=(1, 2))[idx])
        f = feats[idx].copy()
        if k in (1, 2):
            f[:, 1] = -f[:, 1]
        if k in (2, 3):
            f[:, 2] = -f[:, 2]
        f[:, 5] = (f[:, 5] + 90 * k) % 360
        out_f.append(f)
    return np.concatenate(out_m), np.concatenate(out_f)


bench("rotation_augmentation", rotation_augmentation)

# 3. spherical conversion + round trip over 600k events (to_XY_astropy /
#    to_R_astropy formulas).
ze = rng.random(600_000) * 60
az = rng.random(600_000) * 360


def spherical_roundtrip():
    zer = np.radians(90 - ze)
    azr = np.radians(az)
    x = np.cos(zer) * np.cos(azr)
    yy = np.cos(zer) * np.sin(azr)
    z = np.sin(zer)
    ze2 = 90 - np.degrees(np.arctan2(np.sqrt(1 - x * x - yy * yy),
                                     np.sqrt(x * x + yy * yy)))
    return x, yy, z, ze2 - ze


bench("spherical_roundtrip", spherical_roundtrip)

# 4. scaler fit + apply (log1p standard) over 1.5M values
#    (train_classification.py:184-200, StandardScaler math).
vals = rng.random(1_500_000) * 1e5


def scaler_fit_apply():
    lv = np.log(vals + 1)
    mu, sigma = lv.mean(), lv.std()
    return (np.log(vals + 1) - mu) / sigma


bench("scaler_fit_apply", scaler_fit_apply)

# 5. rot90 of 8x8 grids over 600k rows (q24 / grid_rot90 shape).
grids8 = rng.random((600_000, 8, 8)).astype(np.float32)
bench("rot90_8x8_600k", lambda: np.rot90(grids8, 1, axes=(1, 2)).copy())

print(json.dumps(results))
