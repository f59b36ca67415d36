"""Round-3 integral probe L: sub-banded column scans (fewer grid steps at
constant column-matmul FLOPs).

Motivation: the shipped kernel's band sweep showed 48 optimal (32: 0.172,
48: 0.148-0.160, 64: 0.165, 96: 0.174 ms) — bigger bands halve the
sequential grid steps but the in-band column matmul grows as band^2, and at
96 the extra FLOPs beat the saved per-step overhead. This probe decouples
the two: a block of k*sub rows runs ONE full-block row pass (better MXU
utilization than k separate (sub*nt,128) matmuls) and then k SEQUENTIAL
sub-row column scans chained through an in-kernel i32 carry — column FLOPs
stay at k*sub^2*W (= the band-48 cost) while grid steps drop k-fold
(45 -> 15 at 4K for k=3, which also pads to zero: 2160 = 15*144).

Exactness is the shipped argument unchanged: each sub-band executes the
identical [256L|L] fused column matmul + 12/8-split carry scans; the
cross-sub carry is the same i32 add the cross-band carry already is.

Run: python scripts/probes/integral_r3l_probe.py          (TPU timing)
     python scripts/probes/integral_r3l_probe.py --cpu    (interpret-mode
     exactness only: 97x300, 64x7680 all-255, 333x129)
"""

import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import pad_to_multiple
from tpuimg.core.timing import time_stream_fn
from tpuimg.kernels import interpret_mode
from tpuimg.kernels.scan2d import integral_pallas, _tri

_HI = jax.lax.Precision.HIGHEST
_ARGS = (((1,), (0,)), ((), ()))


def _kernel(x_ref, o_ref, carry, *, sub, k):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape  # rows == sub * k
    nt = wp // 128
    # full-block row pass (one big MXU matmul + one cross-tile carry matmul)
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32
    ).reshape(rows, nt, 128)
    totals = intile[:, :, 127]
    tc_all = jax.lax.dot_general(
        totals, _tri(nt, strict=True, dtype=jnp.float32), _ARGS,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    f_all = intile.reshape(rows, wp)
    hi_all = jnp.floor(f_all * (1.0 / 256.0))
    lo_all = f_all - hi_all * 256.0

    L = _tri(sub, strict=False, dtype=jnp.float32)
    W2 = jnp.concatenate([L * 256.0, L], axis=1)
    hi_prec = None if wp <= 4096 else _HI

    cur = carry[:]
    for j in range(k):
        r0 = j * sub
        hl = jnp.concatenate([hi_all[r0:r0 + sub], lo_all[r0:r0 + sub]],
                             axis=0)
        s2d = jax.lax.dot_general(W2, hl, _ARGS,
                                  preferred_element_type=jnp.float32)
        tc = tc_all[r0:r0 + sub]
        th = jnp.floor(tc * (1.0 / 4096.0))
        tl = tc - th * 4096.0
        sth = jax.lax.dot_general(L, th, _ARGS, precision=hi_prec,
                                  preferred_element_type=jnp.float32)
        stl = jax.lax.dot_general(L, tl, _ARGS, precision=_HI,
                                  preferred_element_type=jnp.float32)
        tc2d = (sth.astype(jnp.int32) << 12) + stl.astype(jnp.int32)
        tcw = jnp.repeat(tc2d, 128, axis=1)
        s = s2d.astype(jnp.int32) + tcw + cur
        o_ref[r0:r0 + sub, :] = s
        cur = s[sub - 1:sub, :]
    carry[:] = cur


def make(sub, k):
    body = functools.partial(_kernel, sub=sub, k=k)
    band = sub * k

    @jax.jit
    def run(img):
        x, (h, w) = pad_to_multiple(jnp.asarray(img), band, 128,
                                    mode="constant")
        hp, wp = x.shape
        out = pl.pallas_call(
            body,
            grid=(hp // band,),
            in_specs=[pl.BlockSpec((band, wp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((band, wp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)],
            interpret=interpret_mode(),
        )(x)
        return out[:h, :w]

    return run


CASES = [
    ("L1_sub48_k2", dict(sub=48, k=2)),   # block 96,  4K: 23 steps (+2% pad)
    ("L2_sub48_k3", dict(sub=48, k=3)),   # block 144, 4K: 15 steps (0 pad)
    ("L3_sub48_k4", dict(sub=48, k=4)),   # block 192, 4K: 12 steps (+7% pad)
    ("L4_sub32_k3", dict(sub=32, k=3)),   # block 96,  4K: 23 steps (+2% pad)
    ("L5_sub24_k6", dict(sub=24, k=6)),   # block 144, 4K: 15 steps (0 pad)
    ("L6_sub40_k3", dict(sub=40, k=3)),   # block 120, 4K: 18 steps (0 pad)
]


def _ref(img):
    return np.cumsum(np.cumsum(img.astype(np.int64), 0), 1).astype(np.int32)


def check_exact():
    rng = np.random.default_rng(7)
    shapes = [
        rng.integers(0, 256, (97, 300), dtype=np.uint8),
        np.full((64, 7680), 255, np.uint8),  # wide-frame carry worst case
        rng.integers(0, 256, (333, 129), dtype=np.uint8),
    ]
    ok = True
    for name, kw in CASES:
        fn = make(**kw)
        for img in shapes:
            got = np.asarray(fn(img))
            e = bool((got == _ref(img)).all())
            ok &= e
            if not e:
                print(f"{name}: INEXACT at {img.shape}", flush=True)
        print(f"{name}: exact on {len(shapes)} shapes", flush=True)
    return ok


def main():
    print(jax.devices(), flush=True)
    if "--cpu" in sys.argv:
        print("exact:", check_exact())
        return

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2160, 3840), dtype=np.uint8)
    ref = _ref(img)
    x = jnp.asarray(img)

    r0 = time_stream_fn(integral_pallas, x, name="V0")
    print(f"V0_shipped: {r0.ms:.4f} ms   ({2160*3840/r0.ms/1e6:.1f} GPix/s)",
          flush=True)

    for name, kw in CASES:
        try:
            fn = make(**kw)
            got = np.asarray(fn(x))
            exact = bool((got == ref).all())
            r = time_stream_fn(fn, x, name=name)
            print(f"{name}: {r.ms:.4f} ms  exact={exact}"
                  f"   ({2160*3840/r.ms/1e6:.1f} GPix/s)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:250]
            print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)

    r0b = time_stream_fn(integral_pallas, x, name="V0_again")
    print(f"V0_shipped_again: {r0b.ms:.4f} ms (variance anchor)", flush=True)


if __name__ == "__main__":
    main()
