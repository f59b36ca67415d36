"""Multi-chip scaling: data-parallel batching + spatially-sharded single frames.

The reference is strictly single-GPU (SURVEY.md §2.2: no streams, no NCCL/MPI).
The TPU-native scaling layer provides what the reference structurally hints at:

- **DP**: batch of frames sharded over a mesh ``data`` axis — each op here is
  already batch-polymorphic over leading dims, so DP is a sharding annotation
  and XLA does the rest.
- **SP (spatial)**: one frame sharded by rows over an ``sp`` axis. Stencil ops
  (gaussian, morphology, box/guided) need a radius-deep halo exchange with ICI
  neighbors — ``shard_map`` + ``lax.ppermute``, the multi-chip generalization
  of the reference's in-kernel smem halo staging (gGaussShare,
  GaussianFilter/gaussian.cu:73-126). Scan ops (integral) need a cross-shard
  carry — the same hierarchical carry decomposition the reference uses across
  thread blocks (hIntegral, Integral/integral_d.cu:863-893) at chip radix:
  local scan, exchange per-shard totals, add exclusive prefix.
- Histogram ops need a global reduction (``psum`` of per-shard histograms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuimg.core.borders import pad_mode


def make_mesh(n_data: int, n_sp: int, devices=None) -> Mesh:
    """(data, sp) mesh over the first n_data*n_sp devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_sp), ("data", "sp"))


def shard_batch(mesh: Mesh, batch):
    """Place a (B, H, W) batch with B sharded over the ``data`` axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data", None, None)))


def shard_rows(mesh: Mesh, img):
    """Place a (..., H, W) image with H sharded over the ``sp`` axis."""
    spec = P(*([None] * (img.ndim - 2)), "sp", None)
    return jax.device_put(img, NamedSharding(mesh, spec))


def _spec(ndim: int) -> P:
    """Default partitioning: leading batch dim on ``data`` (if present), rows
    on ``sp``, columns replicated."""
    if ndim == 2:
        return P("sp", None)
    return P("data", *([None] * (ndim - 3)), "sp", None)


def _halo_exchange(block, radius: int, n: int, axis_name: str, border: str):
    """Pad a row-shard with ``radius`` rows from its ICI neighbors.

    Outer shards fall back to the local border policy — equivalent to padding
    the full image and then sharding, provided each shard holds ≥ radius rows.
    """
    pad_cfg = [(0, 0)] * (block.ndim - 2) + [(radius, radius), (0, 0)]
    local = jnp.pad(block, pad_cfg, mode=pad_mode(border))
    if n == 1:
        return local
    idx = jax.lax.axis_index(axis_name)
    up = [(i, (i + 1) % n) for i in range(n)]    # my last rows → shard i+1
    down = [(i, (i - 1) % n) for i in range(n)]  # my first rows → shard i-1
    top_halo = jax.lax.ppermute(block[..., -radius:, :], axis_name, up)
    bot_halo = jax.lax.ppermute(block[..., :radius, :], axis_name, down)
    top = jnp.where(idx == 0, local[..., :radius, :], top_halo)
    bot = jnp.where(idx == n - 1, local[..., -radius:, :], bot_halo)
    return jnp.concatenate([top, block, bot], axis=-2)


def stencil_sharded(op, radius: int, border: str, mesh: Mesh):
    """Lift a local stencil op (operating on a padded block, producing an
    unpadded block) to a row-sharded image via halo exchange.

    ``op(padded_block)`` must consume exactly ``radius`` halo rows on each
    side of the row axis.
    """
    n_sp = mesh.shape["sp"]

    def run(img):
        spec = _spec(img.ndim)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=spec,
        )
        def inner(block):
            padded = _halo_exchange(block, radius, n_sp, "sp", border)
            return op(padded)

        return inner(img)

    return run


def integral_sharded(mesh: Mesh):
    """Row-sharded integral image with cross-chip carry.

    Local 2D cumsum per shard; the carry into shard k is the column-cumsum of
    all previous shards' last rows — gathered over ICI and prefix-summed with
    a static lower-triangular weighting (the reference's tile-carry scan,
    Integral/integral_d.cu:504-593, at chip radix).
    """

    def run(img):
        spec = _spec(img.ndim)

        @functools.partial(jax.shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
        def inner(block):
            local = jnp.cumsum(
                jnp.cumsum(block.astype(jnp.int32), axis=-1, dtype=jnp.int32),
                axis=-2,
                dtype=jnp.int32,
            )
            last = local[..., -1:, :]  # (..., 1, W) per-shard column totals
            all_last = jax.lax.all_gather(last, "sp", axis=-2, tiled=True)
            idx = jax.lax.axis_index("sp")
            n = jax.lax.axis_size("sp")
            shard_ids = jnp.arange(n)
            mask = (shard_ids < idx).astype(jnp.int32)[:, None]
            carry = jnp.sum(all_last * mask, axis=-2, keepdims=True)
            return local + carry

        return inner(img)

    return run


def hist_equalize_sharded(mesh: Mesh):
    """Row-sharded global HE: psum of per-shard/per-image histograms over the
    ``sp`` axis, shared LUT, local application. Batched inputs keep one
    histogram per image (the ``data`` axis is never reduced)."""
    from tpuimg.kernels.onehot import hist256, hist256_tiled, lut_apply

    def run(img):
        spec = _spec(img.ndim)
        per_image = img.shape[-2] * img.shape[-1]

        @functools.partial(jax.shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
        def inner(block):
            factor = jnp.float32(256.0 / per_image)

            def make_table(hist):
                cdf = jnp.cumsum(hist).astype(jnp.float32)
                return jnp.rint(
                    jnp.minimum(jnp.float32(255.0), cdf * factor)
                ).astype(jnp.uint8)

            if block.ndim == 2:
                hist = jax.lax.psum(hist256(block), "sp")
                return lut_apply(make_table(hist), block)
            b = block.reshape(block.shape[0], -1)
            hists = jax.lax.psum(hist256_tiled(b), "sp")  # (B_local, 256)
            tables = jax.vmap(make_table)(hists)
            return jax.vmap(lut_apply)(tables, block)

        return inner(img)

    return run
