"""On-device comparison metrics.

TPU analog of the reference's device-side verification reduction
(gCmpMaxAbsDiff, Integral/integral_d.cu:811-852): compare two arrays on
device and fetch only the scalar — avoids pulling full frames back to the
host (important on tunneled runtimes where transfers dominate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def max_abs_diff(a, b):
    """Scalar max |a - b| computed on device (float64-safe for int inputs)."""
    af = a.astype(jnp.float32) if a.dtype != jnp.float32 else a
    bf = b.astype(jnp.float32) if b.dtype != jnp.float32 else b
    return jnp.max(jnp.abs(af - bf))


@jax.jit
def max_abs_diff_loc(a, b):
    """(maxdiff, y, x) — the reference's morphology demo also prints the
    location of the max difference (Morphology/main.cpp:103)."""
    d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
    flat = jnp.argmax(d.reshape(-1))
    w = d.shape[-1]
    return d.reshape(-1)[flat], flat // w, flat % w
