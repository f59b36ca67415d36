"""MXU one-hot contraction primitives: histograms and LUT gathers without
scatter/gather.

TPU has no atomics and its generic gather lowering is ~2 orders of magnitude
slower than compute (measured: jnp.take over a 256-entry table at 4K = 65 ms
vs 0.6 ms for the formulation here). The reference's histogram kernels are
atomicAdd-based (Histogram/image_process.cu:33-69,208-239) and its LUT
mapping is a per-pixel global-memory gather (image_process.cu:127-136,
428-471); the TPU-native redesign decomposes the u8 value into nibbles
v = 16*hi + lo and turns both ops into tiny matmuls on one-hot factors:

  hist[16a+b]  = Σ_p (hi_p==a)(lo_p==b)          — (16,P)@(P,16) on the MXU
  table[v_p]   = oh_hi_p · T(16,16) · oh_lo_p    — two (·,16) contractions

Exactness: one-hot factors are 0/1 (exact in int8/bf16); each product row has
a single nonzero, so LUT selection is exact in the table's dtype; histogram
counts accumulate on the MXU in int32 (exact for any image size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _iota16():
    return jnp.arange(16, dtype=jnp.int32)


def onehot_nibbles(x, dtype=jnp.bfloat16):
    """Split u8 values into (hi, lo) nibble one-hots of shape (..., 16)."""
    xi = x.astype(jnp.int32)
    i16 = _iota16()
    oh_hi = ((xi >> 4)[..., None] == i16).astype(dtype)
    oh_lo = ((xi & 15)[..., None] == i16).astype(dtype)
    return oh_hi, oh_lo


def hist256(x):
    """256-bin histogram of a u8 array (any shape), int32 counts.

    int8 one-hot factors with int32 MXU accumulation — exact for any size,
    and ~2x faster than the bf16 path (measured on v5e).
    """
    flat = x.reshape(-1)
    oh_hi, oh_lo = onehot_nibbles(flat, jnp.int8)
    h = jax.lax.dot_general(
        oh_hi.T, oh_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return h.reshape(256)


def hist256_tiled(tiles):
    """Per-tile 256-bin histograms: (T, ...) u8 → (T, 256) int32.

    TPU analog of gCalcTileHistsUnroll (Histogram/image_process.cu:208-239):
    one batched (P,16)ᵀ@(P,16) int8 contraction per tile instead of smem
    atomics.
    """
    T = tiles.shape[0]
    flat = tiles.reshape(T, -1)
    oh_hi, oh_lo = onehot_nibbles(flat, jnp.int8)  # (T, P, 16)
    h = jnp.einsum(
        "tpa,tpb->tab", oh_hi, oh_lo, preferred_element_type=jnp.int32
    )
    return h.reshape(T, 256)


def lut_apply(table, x):
    """dst_p = table[x_p] for a 256-entry table, via nibble contraction.

    Exact for u8 tables (selection, not summation). For float tables the
    matmuls run in the table's dtype.
    """
    table = jnp.asarray(table)
    if table.dtype in (jnp.uint8, jnp.int8):
        # 8-bit entries are bf16-exact; wider ints are NOT (bf16 has 8
        # mantissa bits — e.g. 257 rounds to 256, round-2 review finding)
        T = table.astype(jnp.bfloat16).reshape(16, 16)
        oh_hi, oh_lo = onehot_nibbles(x, jnp.bfloat16)
        mid = jnp.einsum("...a,ab->...b", oh_hi, T)
        val = jnp.sum(mid * oh_lo, axis=-1)
        return val.astype(table.dtype)
    if jnp.issubdtype(table.dtype, jnp.integer):
        # wider integer tables: select each 16-bit half exactly through
        # HIGHEST-precision f32 (halves < 2^16 << 2^24) and recombine in
        # int32 — exact for the full int32 range incl. negatives
        t32 = table.astype(jnp.int32)
        oh_hi, oh_lo = onehot_nibbles(x, jnp.float32)

        def select(half):
            T = half.astype(jnp.float32).reshape(16, 16)
            mid = jnp.einsum("...a,ab->...b", oh_hi, T, precision="highest")
            return jnp.sum(mid * oh_lo, axis=-1).astype(jnp.int32)

        val = (select(t32 >> 16) << 16) + select(t32 & 0xFFFF)
        return val.astype(table.dtype)
    T = table.astype(jnp.float32).reshape(16, 16)
    oh_hi, oh_lo = onehot_nibbles(x, jnp.float32)
    # precision="highest": JAX's default matmul precision truncates f32
    # operands to bf16 passes, which would perturb the selected value.
    mid = jnp.einsum("...a,ab->...b", oh_hi, T, precision="highest")
    return jnp.sum(mid * oh_lo, axis=-1)


def lut_apply4(t11, t12, t21, t22, x):
    """Evaluate four 256-entry float tables at the same u8 indices, sharing
    the one-hot factors (the CLAHE 4-corner lookup,
    image_process.cu:462-469). Returns four float32 arrays.

    Uses precision=highest f32 einsums for exact table selection. Two
    fewer-MXU-pass alternatives were benchmarked on v5e and BOTH measured
    slower (don't re-try without new evidence):
    - 3-way bf16 split of the f32 tables, fused (16, 64) operand: 6.8 ms
      CLAHE vs 4.4 ms, and fma-boundary exactness regressed;
    - base-256 digit decomposition of the integer cdfs with single-pass
      bf16 matmuls + f32 recombination: 4.8 ms vs 4.4 ms;
    - fusing all 4 tables into one (16, 64) HIGHEST matmul: 4.58 ms vs
      4.51 ms (a wash — the op is fusion-bound, not MXU-pass-bound).
    The per-table HIGHEST einsum wins because XLA keeps the whole chain in
    one fusion; a further speedup needs a Pallas kernel with VMEM-resident
    tables, not einsum reshuffling.
    """
    oh_hi, oh_lo = onehot_nibbles(x, jnp.float32)
    outs = []
    for t in (t11, t12, t21, t22):
        T = t.astype(jnp.float32).reshape(16, 16)
        mid = jnp.einsum("...a,ab->...b", oh_hi, T, precision="highest")
        outs.append(jnp.sum(mid * oh_lo, axis=-1))
    return outs


