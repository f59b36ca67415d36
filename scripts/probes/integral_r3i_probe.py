"""Round-3 integral probe, part 9: isolate the shift-cumsum compile failure.

H1/H2 (r3h) failed with a Mosaic internal error. Find which construct
breaks on a (48, 30) f32 array inside a trivial Pallas kernel:

  I0  concat-shift cumsum along axis=0 (sublanes) only
  I1  concat-shift cumsum along axis=1 (lanes, width 30) only
  I2  pltpu.roll + iota mask cumsum along axis=1
  I3  pad lanes 30->128, concat-shift along axis=1, slice back
  I4  transposed: scan a (30, 48) array along axis=0 (sublanes)

Run: python scripts/probes/integral_r3i_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _concat_scan(x, axis):
    n = x.shape[axis]
    d = 1
    while d < n:
        if axis == 1:
            z = jnp.zeros((x.shape[0], d), x.dtype)
            x = x + jnp.concatenate([z, x[:, :-d]], axis=1)
        else:
            z = jnp.zeros((d, x.shape[1]), x.dtype)
            x = x + jnp.concatenate([z, x[:-d, :]], axis=0)
        d *= 2
    return x


def _roll_scan_lanes(x):
    rows, n = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    d = 1
    while d < n:
        shifted = pltpu.roll(x, d, 1)
        x = x + jnp.where(col >= d, shifted, 0.0)
        d *= 2
    return x


def _pad_scan_lanes(x):
    rows, n = x.shape
    xp = jnp.concatenate([x, jnp.zeros((rows, 128 - n), x.dtype)], axis=1)
    d = 1
    while d < n:
        z = jnp.zeros((rows, d), x.dtype)
        xp = xp + jnp.concatenate([z, xp[:, :-d]], axis=1)
        d *= 2
    return xp[:, :n]


def _kernel(x_ref, o_ref, *, mode):
    x = x_ref[:]
    if mode == "ax0":
        o_ref[:] = _concat_scan(x, 0)
    elif mode == "ax1":
        o_ref[:] = _concat_scan(x, 1)
    elif mode == "roll":
        o_ref[:] = _roll_scan_lanes(x)
    elif mode == "pad":
        o_ref[:] = _pad_scan_lanes(x)
    else:  # transposed sublane scan
        o_ref[:] = _concat_scan(x, 0)


def run_case(name, mode, shape, axis):
    x = np.random.default_rng(1).uniform(0, 100, shape).astype(np.float32)
    ref = np.cumsum(x, axis=axis)
    body = functools.partial(_kernel, mode=mode)
    try:
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(jnp.asarray(x))
        ok = bool(np.allclose(np.asarray(out), ref, atol=1e-2))
        print(f"{name}: compiled, exact={ok}")
    except Exception as e:
        print(f"{name}: FAILED {str(e).splitlines()[0][:160]}")


def main():
    print(jax.devices())
    run_case("I0_ax0_sublanes", "ax0", (48, 30), 0)
    run_case("I1_ax1_lanes30", "ax1", (48, 30), 1)
    run_case("I2_roll_mask", "roll", (48, 30), 1)
    run_case("I3_pad128", "pad", (48, 30), 1)
    run_case("I4_transposed", "t", (30, 48), 0)


if __name__ == "__main__":
    main()
