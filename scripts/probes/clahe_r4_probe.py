"""Round-4 CLAHE fusion probe: i32-packed regroup + single-launch mapping.

Measures on the real chip with the streaming protocol (time_stream_fn),
4K 8x8 clip2/clip40 (the BENCH_DETAIL config):
  - clahe total (round-3 recorded 0.627 ms at clip 40)
  - stage split: tile hists via packed-i32 regroup vs u8 regroup
  - enhance pipeline fused (f32 bridge + fused tail kernel) vs staged
    (round-3 recorded 1.851 ms)
Run: python scripts/probes/clahe_r4_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import tpuimg
from tpuimg.core.timing import time_stream_fn
from tpuimg.ops import histogram as H
from tpuimg.pipeline import enhance


def bench(label, fn, x, iters=24):
    r = time_stream_fn(fn, x, iters=iters, name=label)
    print(f"{label:38s} {r.ms:.4f} ms (alt {r.ms_alt:.4f})", flush=True)
    return r.ms


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (2160, 3840), dtype=np.uint8))

    bench("clahe 4k 8x8 clip40 (new)", lambda v: tpuimg.clahe(v, 40.0, 8, 8),
          img)

    th, tw = 270, 480
    bench("tile hists (packed i32 path)",
          lambda v: H._hist_tiles(v, 8, 8, th, tw), img)

    def u8_path(v):
        tiles = v.reshape(8, th, 8, tw).transpose(0, 2, 1, 3)
        from tpuimg.kernels.hist import hist256_groups_pallas
        return hist256_groups_pallas(tiles.reshape(64, th * tw))
    bench("tile hists (u8 transpose path)", u8_path, img)

    a = np.asarray(H._hist_tiles(img, 8, 8, th, tw))
    b = np.asarray(u8_path(img))
    print("hist paths identical:", bool((a == b).all()))

    from tpuimg.oracle import clahe_ref
    got = np.asarray(tpuimg.clahe(img, 40.0, 8, 8))
    ref = clahe_ref(np.asarray(img), 40.0, 8, 8)
    print("clahe maxdiff vs oracle:",
          np.abs(got.astype(int) - ref.astype(int)).max(), flush=True)

    bench("enhance 4k (fused)", lambda v: enhance(v), img, iters=12)
    bench("enhance 4k (staged)", lambda v: enhance(v, impl="staged"), img,
          iters=12)
    d = np.abs(np.asarray(enhance(img)).astype(int)
               - np.asarray(enhance(img, impl="staged")).astype(int)).max()
    print("fused vs staged maxdiff:", d)


if __name__ == "__main__":
    main()
