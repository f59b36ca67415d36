"""Round-2 histogram kernel probe: split one-hot construction vs MXU
contraction cost; try int8 one-hots."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import functools

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tpuimg
from tpuimg.core.layout import round_up
from tpuimg.core.timing import time_stream_fn
from tpuimg.kernels import interpret_mode

key = jax.random.PRNGKey(0)
img = jax.random.randint(key, (2160, 3840), 0, 256, jnp.int32).astype(jnp.uint8)
PIX = 2160 * 3840
REF = np.bincount(np.asarray(img).ravel(), minlength=256)


def make(mode, rows=32, oh_dtype=jnp.bfloat16):
    def kern(x_ref, o_ref):
        x = x_ref[0].astype(jnp.int32)
        n = x.shape[0] * x.shape[1]
        hi = (x >> 4).reshape(1, n)
        lo = (x & 15).reshape(1, n)
        bins = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
        if mode == "matmul-only":
            # skip construction: reuse a cheap cast as fake operands
            ohh = jnp.broadcast_to(hi, (16, n)).astype(oh_dtype)
            ohl = jnp.broadcast_to(lo, (16, n)).astype(oh_dtype)
        else:
            ohh = (jnp.broadcast_to(hi, (16, n)) == bins).astype(oh_dtype)
            ohl = (jnp.broadcast_to(lo, (16, n)) == bins).astype(oh_dtype)
        if mode == "compare-only":
            part = (jnp.sum(ohh.astype(jnp.float32), axis=1, keepdims=True)
                    + jnp.sum(ohl.astype(jnp.float32), axis=1, keepdims=True))
            part = jnp.broadcast_to(part, (16, 16))
        else:
            part = jax.lax.dot_general(
                ohh, ohl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
                if oh_dtype == jnp.bfloat16 else jnp.int32,
            ).astype(jnp.float32)
        o_ref[0] = jnp.concatenate(
            [part, jnp.zeros((16, 112), jnp.float32)], axis=1
        ).astype(jnp.int32)

    @jax.jit
    def run(im):
        h, w = im.shape
        hp, wp = round_up(h, rows), round_up(w, 128)
        x = jnp.pad(im, ((0, hp - h), (0, wp - w)))
        g = hp // rows
        out = pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[pl.BlockSpec((1, rows, wp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 16, 128), jnp.int32),
            interpret=interpret_mode(),
        )(x.reshape(g, rows, wp))
        return jnp.sum(out[:, :, :16], axis=0).reshape(256)

    return run


def bench(name, fn, check=False):
    try:
        out = np.asarray(fn(img))
        note = ""
        if check:
            note = " EXACT" if (out == REF).all() else " WRONG"
        r = time_stream_fn(fn, img, iters=32, pixels=PIX)
        print(f"{name:26s} {r.ms:8.3f} ms {r.gpix_s:8.2f} GPix/s{note}",
              flush=True)
    except Exception as e:
        print(f"{name:26s} ERROR {str(e)[:160]}", flush=True)


bench("full bf16 r32 (current)", make("full", 32, jnp.bfloat16), check=True)
bench("full bf16 r64", make("full", 64, jnp.bfloat16), check=True)
bench("full bf16 r128", make("full", 128, jnp.bfloat16), check=True)
bench("full int8", make("full", 32, jnp.int8), check=True)
bench("compare-only bf16", make("compare-only", 32, jnp.bfloat16))
bench("compare-only int8", make("compare-only", 32, jnp.int8))
bench("matmul-only bf16", make("matmul-only", 32, jnp.bfloat16))
# how fast is the LUT apply for context
from tpuimg.kernels.lut import lut_gather
tab = jnp.arange(256, dtype=jnp.int32).astype(jnp.uint8)
bench("lut_gather apply", lambda x: lut_gather(tab, x))
bench("hist_equalize e2e", tpuimg.hist_equalize)
print("DONE", flush=True)
