"""Hostile-domain probe: tiny shapes and extreme params through every public
op vs its oracle, on CPU. The validators admit any h,w >= 1; the standing
fuzz suite starts at 16x16 — this sweeps the 1..15 px band plus radius >=
image-size cases, hunting crashes that are not typed errors and oracle
mismatches. Findings feed tests/ (not itself a test: slow full sweep).

Run: JAX_PLATFORMS=cpu python scripts/probes/edge_domain_probe.py
"""

from __future__ import annotations

import itertools
import sys
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import tpuimg
from tpuimg.core.validate import TpuImgError
from tpuimg.oracle import (
    clahe_ref,
    dilate_ref,
    erode_ref,
    gaussian_ref,
    guided_filter_ref,
    hist_equalize_ref,
    integral_ref,
)

rng = np.random.default_rng(7)
report = {"ok": 0, "typed": 0, "crash": [], "mismatch": []}


def check(tag, fn, ref_fn, tol):
    try:
        got = np.asarray(fn())
    except TpuImgError:
        report["typed"] += 1
        return
    except Exception:
        report["crash"].append((tag, traceback.format_exc(limit=3)))
        return
    try:
        ref = np.asarray(ref_fn())
    except Exception:
        report["crash"].append((tag + " [ORACLE]", traceback.format_exc(limit=2)))
        return
    if got.shape != ref.shape:
        report["mismatch"].append((tag, f"shape {got.shape} vs {ref.shape}"))
        return
    diff = float(np.max(np.abs(got.astype(np.float64) - ref.astype(np.float64)))) if got.size else 0.0
    if diff > tol:
        report["mismatch"].append((tag, f"maxdiff {diff:g} > {tol:g}"))
    else:
        report["ok"] += 1


SIZES = [1, 2, 3, 5, 8, 9, 15]

for h, w in itertools.product(SIZES, SIZES):
    u8 = rng.integers(0, 256, (h, w), dtype=np.uint8)
    f32 = rng.random((h, w), dtype=np.float32)

    check(f"integral {h}x{w}", lambda: tpuimg.integral(u8),
          lambda: integral_ref(u8), 0)
    check(f"he {h}x{w}", lambda: tpuimg.hist_equalize(u8),
          lambda: hist_equalize_ref(u8), 0)
    for r in (1, 2, max(h, w)):
        check(f"erode r{r} {h}x{w}", lambda: tpuimg.erode(u8, r),
              lambda: erode_ref(u8, r), 0)
        check(f"dilate r{r} {h}x{w}", lambda: tpuimg.dilate(u8, r),
              lambda: dilate_ref(u8, r), 0)
        check(f"gauss r{r} {h}x{w}", lambda: tpuimg.gaussian(f32, r, 1.0),
              lambda: gaussian_ref(f32, r, 1.0), 1e-5)
        check(f"guided r{r} {h}x{w}",
              lambda: tpuimg.guided_filter(f32, f32, r, 1e-3),
              lambda: guided_filter_ref(f32, f32, r, 1e-3), 1e-4)
    # CLAHE on tiny images: most grids invalid (typed errors expected)
    check(f"clahe 2x2 {h}x{w}", lambda: tpuimg.clahe(u8, 4.0, 2, 2),
          lambda: clahe_ref(u8, 4.0, 2, 2), 1)

# constant / extreme-value content at a normal-ish shape
for name, img in [("zeros", np.zeros((24, 40), np.uint8)),
                  ("ones255", np.full((24, 40), 255, np.uint8))]:
    check(f"he {name}", lambda: tpuimg.hist_equalize(img),
          lambda: hist_equalize_ref(img), 0)
    check(f"clahe {name}", lambda: tpuimg.clahe(img, 2.0, 2, 2),
          lambda: clahe_ref(img, 2.0, 2, 2), 1)
fconst = np.full((24, 40), 0.5, np.float32)
check("guided const", lambda: tpuimg.guided_filter(fconst, fconst, 2, 1e-3),
      lambda: guided_filter_ref(fconst, fconst, 2, 1e-3), 1e-4)

print(f"\nOK={report['ok']} typed={report['typed']} "
      f"crashes={len(report['crash'])} mismatches={len(report['mismatch'])}")
for tag, msg in report["mismatch"]:
    print("MISMATCH:", tag, "--", msg)
seen = set()
for tag, tb in report["crash"]:
    key = tb.splitlines()[-1] if tb.splitlines() else ""
    print("CRASH:", tag, "--", key)
    if key not in seen:
        seen.add(key)
        print(tb)
