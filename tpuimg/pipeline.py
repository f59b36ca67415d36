"""Flagship fused pipeline: the whole-frame enhancement chain.

The reference's demos each run one op on one frame (SURVEY.md §3); production
use chains them. On TPU the chain compiles into one XLA program — every
intermediate stays on device (the reference needs a host round-trip and
separate kernel launches between its modules).

``enhance``: u8 frame → CLAHE (local contrast) → Gaussian denoise → guided
filter (edge-preserving detail restore) → u8 frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuimg.ops.gaussian import gaussian
from tpuimg.ops.guided import guided_filter
from tpuimg.ops.histogram import clahe
from tpuimg.core.jit import op_jit


@op_jit(static_argnames=("clip_limit", "tiles", "radius", "sigma", "gf_radius", "gf_eps"))
def enhance(
    img,
    clip_limit: float = 2.0,
    tiles: int = 8,
    radius: int = 2,
    sigma: float = 1.5,
    gf_radius: int = 8,
    gf_eps: float = 1e-3,
):
    """Contrast-enhance + denoise a uint8 (H, W) frame, edges preserved.

    Input validation (uint8-only, typed error on floats) happens in the
    first stage — clahe checks the same array immediately."""
    img = jnp.asarray(img)
    eq = clahe(img, clip_limit, tiles, tiles)
    f = eq.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    smooth = gaussian(f, radius, sigma)
    # fused-path border semantics (reflect101 + 1/ksz^2) — the reference's
    # own 4K guided demo and the Pallas one-pass kernel's native form
    out = guided_filter(f, smooth, gf_radius, gf_eps, border="reflect101")
    return jnp.clip(jnp.rint(out * 255.0), 0.0, 255.0).astype(jnp.uint8)
