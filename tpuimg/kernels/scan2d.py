"""Pallas 2D prefix-scan (integral image), uint8 → int32 — all-MXU form.

Reference: Integral/integral_d.cu — 4-kernel hierarchical carry pipeline
(in-tile scans :13-59, Blelloch scans of tile carries :220-284/:504-593,
carry broadcast :716-749, driver hIntegral :863-893), needed because CUDA
thread blocks can't see each other's results within a launch.

TPU redesign: a Pallas grid on one core executes *sequentially*, so the whole
carry hierarchy collapses into ONE fused pass over row bands — and (round 2b)
BOTH scan directions run as triangular matmuls on the MXU, none on the VPU:

- rows: per-128-lane-tile prefix sums as one triangular matmul (u8 values
  are bf16-exact; DEFAULT-precision f32 operands are truncated to bf16 *in
  the MXU pipeline*, so no explicit convert op is paid), plus a tiny
  HIGHEST-precision cross-tile carry matmul (exact: values < 2^20 < 2^24);
  the row pass covers the WHOLE grid block at once (one big MXU matmul).
- columns: the in-sub-band column prefix is L @ r with L lower-triangular
  ones. Sub-band column sums reach 2^21, but DEFAULT-precision matmuls
  truncate operands to bf16 (8 mantissa bits), so the row-scanned values are
  split into bf16-exact halves hi = ⌊r/256⌋ < 2^7 and lo = r − 256·hi < 2^8
  and scanned by two DEFAULT matmuls (partial sums < 2^21 stay f32-exact);
  recombined with one FMA, still f32-exact.  The cross-tile carry (< W·255,
  up to 2^21 at 8K) is column-scanned separately — by linearity
  colscan(intile + tc) = colscan(intile) + colscan(tc) — as a low-12-bit /
  high-part pair of HIGHEST-precision matmuls on the tiny (sub, ntiles)
  array (HIGHEST on both: the high part exceeds the bf16-exact 2^8 beyond
  width 4224, so a DEFAULT matmul there silently corrupts wide frames).
- **sub-banded blocks** (round 3, probe r3l): each grid block holds k
  sub-bands of ``_SUB = 24`` rows, column-scanned SEQUENTIALLY through an
  in-register i32 carry. This decouples the two costs the old single-band
  form tied together: column-matmul FLOPs scale as sub·block (not block²)
  while the sequential grid shrinks k-fold (45 → 9 steps at 4K). The old
  form's band sweep hit its optimum at 48 (32: 0.172, 48: 0.148-0.160,
  64: 0.165, 96: 0.174 ms) precisely because band² FLOPs beat the saved
  per-step overhead; sub-banding removes the trade-off. Probe grid
  (r3l, same session, shipped anchor 0.157-0.160): sub24 × block
  {120,144,216,240} = 0.1426-0.1447 ms, sub16/sub8 at block ≥144 equal,
  sub4 worse (0.155, carry-chain latency), block 96 worse (0.164-0.170),
  block 432 fails to compile (Mosaic remote-compile 500).
- the running cross-band carry lives in a (1, W) VMEM scratch across the
  sequential band grid — the reference's "scan of tile carries" at band
  radix, with zero extra HBM traffic.

HBM traffic = one u8 read + one i32 write.  Measured (honest streaming
protocol, v5e 4K): 0.143 ms = 58 GPix/s = 4.2x the reference's CUDA
pipeline (0.597 ms, Integral/readme.md:23); round-2 shape was 0.182 ms, the
round-3 gains are the fused [256L|L] column matmul + repeat-broadcast
(probes r3e/r3h, 0.182 → 0.148-0.165) and the sub-banded blocks (probe
r3l, → 0.143). Block selection is width-aware (``_pick_k``): block·W is
capped at the measured-good VMEM point and k prefers zero padding.

Measured dead ends (scripts/probes/integral_mxu_col_probe.py and
integral_r3*_probe.py) — don't re-try without new evidence:
- jnp.cumsum does NOT lower in Pallas TPU ("Unimplemented primitive ...
  cumsum"), so VPU cumsums can't replace the tiny carry matmuls directly;
- concat-based log-depth shift-add scans on the (band, ntiles) carry array
  fail to compile inside the full kernel ("result/input offset mismatch on
  non-concat dimension" — the intile[:, :, 127] slice's offset layout),
  though they compile fine in isolation (probe r3i);
- pltpu.roll+mask log-depth scans compile but are 10x slower (1.46-1.64 ms
  total: the roll relayouts on small odd-shaped arrays dominate);
- reshaping the u8 block BEFORE the i32/f32 converts (1 byte/px relayout):
  0.165 vs 0.158 ms — the u8 sublane-packing relayout is worse;
- folding the carry broadcast into the big column matmul (base-256 digit
  rows appended to [hi; lo]): 0.71 ms AND inexact — the d2-weighted f32
  partial sums exceed the 2^24 integer-exact range;
- MXU width-expansion of the carry scan (probe r3d V5): no change;
- TWO independent carry chains per grid step (top/bottom frame halves, the
  cross-half fix-up as a VMEM-speed XLA add) hoping Mosaic interleaves the
  chains to hide tiny-matmul latency: 0.187-0.191 ms vs 0.163 production,
  bands 32/48/64 (probe r3j) — the doubled per-step VMEM blocks cost more
  than the interleave recovers;
- column-scan-FIRST (u8 needs no split) then 2-part row scan: 0.31 ms —
  the extra relayouts outweigh the saved split;
- tile-major (H·nt, 128) input BlockSpec to skip the in-kernel reshape:
  0.22 ms — no gain, the relayout just moves to the intile→(rows,wp) view;
- HIGHEST precision on a full-size (128,128)@(128,W) matmul: +0.04 ms
  (6-pass bf16 decomposition) — keep HIGHEST for tiny carry matmuls only;
- int8 MXU row pass (x−128 bias trick, i32 accumulation): 0.207 ms — the
  bias-correction ramp costs more than the f32 converts it saves;
- Mosaic fails (opaque remote-compile 500) on THREE dot_generals over the
  small (band, ntiles) array in one kernel; two compile fine — hence the
  12+8-bit two-matmul split for carries rather than three 8-bit parts;
- lax.Precision.HIGH (3-pass bf16, which would replace the manual hi/lo
  split at zero VPU cost) is NOT implemented by Mosaic ("Unsupported dot
  precision: HIGH");
- 3D (band, nt, 128) BlockSpecs + 3D dot_generals to eliminate both
  in-kernel reshapes: 0.46 ms (2.5x WORSE) at bands 48/64/96 — Mosaic's
  3D matmul/layout path costs far more than the two 2D relayouts it saves;
- (probe r3k, on-TPU) direct u8→f32 and u8→bf16 casts do NOT lower in
  Mosaic ("Unsupported cast") — the i32 hop is mandatory, so the "skip a
  convert" lever does not exist; bf16 row operand via the supported
  i32→bf16 hop: 0.175 ms vs 0.160 shipped (extra converts cost more than
  the halved operand VMEM); 256-lane row tiles: 0.162-0.166 ms (wash,
  within chip variance); fine band sweep 40/56 around the 48 plateau:
  0.170/0.188 ms — 48 confirmed optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuimg.core.layout import pad_to_multiple
from tpuimg.kernels import interpret_mode
from tpuimg.core.jit import op_jit

_SUB = 24        # column-scan sub-band rows (probe r3l, see docstring)
_MAX_BLOCK_PX = 240 * 3840  # measured-good VMEM point for block·W (r3l L14)


def _pick_k(h: int, wp: int) -> int:
    """Sub-bands per grid block: minimize row padding, then maximize the
    block (fewer sequential steps), under the block·W VMEM cap."""
    kmax = max(1, min(10, _MAX_BLOCK_PX // (_SUB * wp)))
    best_hp, best_k = None, 1
    for k in range(1, kmax + 1):
        hp = -(-h // (_SUB * k)) * (_SUB * k)
        if best_hp is None or hp < best_hp or (hp == best_hp):
            best_hp, best_k = hp, k
    return best_k

_HI = jax.lax.Precision.HIGHEST
_ARGS = (((1,), (0,)), ((), ()))


def _tri(n, strict, dtype):
    """Lower-triangular ones (contract with dim 0 => inclusive prefix)."""
    a = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((a < b) if strict else (b <= a)).astype(dtype)


def _fused_scan_kernel(x_ref, o_ref, carry, *, k):
    """Full 2D scan in one HBM pass (see module docstring)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    rows, wp = o_ref.shape  # rows == sub · k
    sub = rows // k
    nt = wp // 128
    # row pass, whole block at once: in-tile prefix on the MXU (u8 -> bf16
    # exact in hardware)
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32).reshape(rows * nt, 128)
    U = jnp.transpose(_tri(128, strict=False, dtype=jnp.float32))
    intile = jax.lax.dot_general(
        x, U, _ARGS, preferred_element_type=jnp.float32
    ).reshape(rows, nt, 128)
    # cross-tile row carry (exclusive; values < 2^20 exact under HIGHEST)
    totals = intile[:, :, 127]
    tc_all = jax.lax.dot_general(
        totals, _tri(nt, strict=True, dtype=jnp.float32), _ARGS,
        precision=_HI, preferred_element_type=jnp.float32,
    )
    # split into bf16-exact halves once for the whole block (elementwise,
    # per-row — independent of the sub-band structure below)
    f = intile.reshape(rows, wp)
    hi_all = jnp.floor(f * (1.0 / 256.0))   # < 2^7
    lo_all = f - hi_all * 256.0             # < 2^8

    L = _tri(sub, strict=False, dtype=jnp.float32)
    W2 = jnp.concatenate([L * 256.0, L], axis=1)
    # wp is static: th = floor(tc/4096) < wp·255/4096 stays bf16-exact
    # (≤ 256) for wp ≤ 4096, where the cheaper DEFAULT matmul is safe —
    # measured ~3% of the op at 4K. Wider frames pay HIGHEST.
    hi_prec = None if wp <= 4096 else _HI

    # k sub-bands column-scanned sequentially through an i32 carry (probe
    # r3l): column FLOPs stay at sub·rows·W while the sequential grid
    # shrinks k-fold vs the single-band form.
    cur = carry[:]
    for j in range(k):
        r0 = j * sub
        # column pass: two bf16-exact halves through ONE DEFAULT triangular
        # matmul — the x256 recombine is folded into the weight matrix
        # [256·L | L] @ [hi; lo], so the separate shi·256+slo FMA (and a
        # second matmul launch) disappears (round 3, probe r3e). Partial
        # sums < 2^21 stay f32-exact.
        hl = jnp.concatenate([hi_all[r0:r0 + sub], lo_all[r0:r0 + sub]],
                             axis=0)
        s2d = jax.lax.dot_general(W2, hl, _ARGS,
                                  preferred_element_type=jnp.float32)
        # column scan of the tiny carry, split 12 low bits / the rest. BOTH
        # matmuls run HIGHEST precision beyond width 4224: tc < W·255 (2^21
        # at 8K), so the high part reaches 2^9 — beyond the bf16-exact 2^8
        # a DEFAULT matmul truncates operands to (silent corruption for
        # wide frames, caught in round-2 review). Exactness holds while tc
        # itself stays f32-exact, i.e. W·255 < 2^24 → W ≤ ~65K; (block, W)
        # VMEM blocks stop compiling far earlier anyway.
        tc = tc_all[r0:r0 + sub]
        th = jnp.floor(tc * (1.0 / 4096.0))
        tl = tc - th * 4096.0
        sth = jax.lax.dot_general(L, th, _ARGS, precision=hi_prec,
                                  preferred_element_type=jnp.float32)
        stl = jax.lax.dot_general(L, tl, _ARGS, precision=_HI,
                                  preferred_element_type=jnp.float32)
        tc2d = (sth.astype(jnp.int32) << 12) + stl.astype(jnp.int32)
        # broadcast carries to lanes via jnp.repeat — the 3D reshape-add
        # form ((sub,nt,128) + tc2d[:,:,None]) forced a Mosaic relayout
        # worth ~30 us/frame at 4K (round 3, probe r3e V1-vs-V7)
        tcw = jnp.repeat(tc2d, 128, axis=1)
        s = s2d.astype(jnp.int32) + tcw + cur
        o_ref[r0:r0 + sub, :] = s
        cur = s[sub - 1:sub, :]
    carry[:] = cur


@op_jit()
def integral_pallas(img):
    """Inclusive 2D prefix sum of a (H, W) uint8 image, int32."""
    if img.ndim != 2:
        return jax.vmap(integral_pallas)(img)
    img = jnp.asarray(img)
    h, w = img.shape
    k = _pick_k(h, -(-w // 128) * 128)
    x, (h, w) = pad_to_multiple(img, _SUB * k, 128, mode="constant")
    hp, wp = x.shape
    band = _SUB * k
    # the kernel's sub-band indexing assumes rows == _SUB * k exactly;
    # pad_to_multiple guarantees it (round-3 advisor finding: a silent
    # band < _SUB*k here would misalign `sub = rows // k`)
    assert hp % band == 0, (hp, band)

    out = pl.pallas_call(
        functools.partial(_fused_scan_kernel, k=k),
        grid=(hp // band,),
        in_specs=[
            pl.BlockSpec((band, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((band, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, wp), jnp.int32)],
        interpret=interpret_mode(),
    )(x)
    return out[:h, :w]
