"""Log-depth sliding-window reductions over VMEM blocks.

The reference computes windowed sums/extremes with one op per tap
(gGaussOptim-style unrolled loops, GaussianFilter/gaussian.cu:214-271;
gMorphSplit min/max loops, Morphology/image_process.cu:217-263) or with van
Herk prefix/suffix scans for large kernels (image_process.cu:31-170). On the
TPU VPU a window of size k over a VMEM-resident block costs O(log k) full
vector ops instead:

- extremes (min/max are idempotent): build power-of-two partial extremes by
  doubling, P_{2p}[i] = f(P_p[i], P_p[i+p]); a window of any size k is then
  f(P_q[i], P_q[i + k - q]) with q the largest power of two <= k — the two
  spans may OVERLAP, which is harmless for idempotent ops. This is van
  Herk/Gil-Werman collapsed to log depth (no ksz-aligned segments needed).
- sums (not idempotent): the same doubling ladder, then the binary
  decomposition of k as disjoint power-of-two spans laid end to end:
  k = Σ 2^{b_j}  ⇒  S_k[i] = Σ_j P_{2^{b_j}}[i + off_j].

Cost: ⌊log2 k⌋ ladder ops + (1 extreme | popcount(k) sum) combine ops per
pixel per axis — e.g. a 31-tap window sum is 9 adds instead of 30, a 51-tap
window min is 6 ops instead of 50.

``axis`` 0 slides along sublanes, 1 along lanes; inputs are plain jnp arrays
(VMEM blocks inside a Pallas kernel). Slices shrink the array — the caller
supplies ``k - 1`` taps of halo, exactly as for the unrolled form.
"""

from __future__ import annotations

import jax.numpy as jnp


def _slide(x, start: int, length: int, axis: int):
    if axis == 0:
        return x[start : start + length]
    return x[:, start : start + length]


def window_extreme(x, ksz: int, out_len: int, axis: int, fn, start: int = 0):
    """fn-extreme over windows [start+i, start+i+ksz) along ``axis``.

    ``x`` must extend at least ``start + out_len + ksz - 1`` along ``axis``.
    """
    if ksz == 1:
        return _slide(x, start, out_len, axis)
    p = 1
    cur = x
    n = x.shape[axis]
    while p * 2 <= ksz:
        cur = fn(_slide(cur, 0, n - p, axis), _slide(cur, p, n - p, axis))
        n -= p
        p *= 2
    # cur[i] = extreme over [i, i+p); overlap of the two q-spans is fine
    return fn(_slide(cur, start, out_len, axis),
              _slide(cur, start + ksz - p, out_len, axis))


def window_sum(x, ksz: int, out_len: int, axis: int, start: int = 0):
    """Sum over windows [start+i, start+i+ksz) along ``axis``.

    ``x`` must extend at least ``start + out_len + ksz - 1`` along ``axis``.
    """
    if ksz == 1:
        return _slide(x, start, out_len, axis)
    ladder = {1: x}
    lens = {1: x.shape[axis]}
    p = 1
    while p * 2 <= ksz:
        cur, n = ladder[p], lens[p]
        ladder[2 * p] = _slide(cur, 0, n - p, axis) + _slide(cur, p, n - p, axis)
        lens[2 * p] = n - p
        p *= 2
    acc = None
    off = start
    rem = ksz
    for q in sorted(ladder, reverse=True):
        if rem >= q:  # each power of two appears at most once in binary k
            part = _slide(ladder[q], off, out_len, axis)
            acc = part if acc is None else acc + part
            off += q
            rem -= q
    return acc
