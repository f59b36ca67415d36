"""Demo / benchmark CLI — the TPU analog of the reference's L3 layer.

Each subcommand mirrors one reference demo executable (SURVEY.md §3 call
stacks): load or synthesize an image, run the op (XLA and Pallas variants),
verify by max-abs-diff against the NumPy oracle, time with the nrepeats
discipline, and write result PNGs.

    python -m tpuimg gaussian 3840 2160 1 1.0 100 [src.png]
    python -m tpuimg integral [--width 3840 --height 2160 --nreps 100]
    python -m tpuimg integral-autotest [--runs 20]
    python -m tpuimg he image.png
    python -m tpuimg enhance [image.png] [--clip 2.0 --tiles 8 --gf-radius 8]
    python -m tpuimg clahe image.png [--clip 1.0 --xtiles 8 --ytiles 8]
    python -m tpuimg guided [--radius 4 --eps 0.3 --nreps 100] [--src ...]
    python -m tpuimg morphology [--radius 5 --mode 0 --nreps 100] [--src ...]
    python -m tpuimg sweep {gaussian,guided,morphology} [--radii 1-7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _maxdiff(a, b):
    # host-side on purpose: the reference side is a host NumPy oracle, so a
    # device-side compare (ops.metrics) would just move the transfer from
    # download(out) to upload(ref) — no traffic win on the tunneled runtime
    return float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())


def _time(fn, arg, nreps, pixels):
    from tpuimg.core.timing import time_stream_fn

    return time_stream_fn(fn, arg, iters=max(8, min(nreps, 64)), pixels=pixels)


def _report(name, ms, gpix, diff, tol):
    status = "OK" if diff <= tol else "FAIL"
    print(f"{name:28s} {ms:9.3f} ms  {gpix:8.2f} GPix/s  maxdiff={diff:g} [{status}]")
    return diff <= tol


def _load_or_random(path, w, h, dtype):
    from tpuimg.utils import imread_gray

    if path:
        img = imread_gray(path)
        if dtype == np.float32:
            img = img.astype(np.float32) / 255.0
        return img
    rng = np.random.default_rng(0)
    if dtype == np.float32:
        return rng.random((h, w), dtype=np.float32)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def _out_path(base, tag):
    root, _ = os.path.splitext(base or "demo.png")
    return f"{root}_{tag}.png"


def cmd_gaussian(args):
    import jax.numpy as jnp

    import tpuimg
    from tpuimg.oracle import gaussian_ref
    from tpuimg.utils import imwrite

    from tpuimg.core.params import GaussianConfig

    img = _load_or_random(args.src, args.width, args.height, np.float32)
    h, w = img.shape
    ref = gaussian_ref(img, args.radius, args.sigma)
    x = jnp.asarray(img)
    ok = True

    # the full runnable impl ladder (round 5, VERDICT r4 item 8), like the
    # reference keeps all five gaussian rungs timed in one harness
    # (gaussian.cu:409-663): naive full-window 2D conv, the separable split
    # (XLA), and the VMEM-band Pallas kernel (the shared-mem tile + rolling
    # strip rungs, subsumed per SURVEY §2.1)
    import jax

    from tpuimg.core.kernelgen import gaussian_kernel_1d

    rr, sg = args.radius, args.sigma
    k1 = np.asarray(gaussian_kernel_1d(2 * rr + 1, sg))
    k2 = np.outer(k1, k1).astype(np.float32)

    @jax.jit
    def naive2d(v):
        # (2r+1)^2 shifted adds, no separability — the naive rung
        # (gGaussianFilter, gaussian.cu:conv loop)
        xp = jnp.pad(v, rr, mode="reflect")
        acc = jnp.zeros_like(v)
        for i in range(2 * rr + 1):
            for j in range(2 * rr + 1):
                acc = acc + jnp.float32(k2[i, j]) * xp[i : i + h, j : j + w]
        return acc

    rungs = [
        ("naive2d", naive2d),
        ("xla", lambda v: tpuimg.gaussian(v, rr, sg, impl="xla")),
        ("pallas", lambda v: tpuimg.gaussian(v, rr, sg, impl="pallas")),
    ]
    for impl, fn in rungs:
        if impl != "naive2d":
            GaussianConfig(radius=rr, sigma=sg, impl=impl)  # validate
        out = np.asarray(fn(x))
        r = _time(fn, x, args.nreps, h * w)
        ok &= _report(f"gaussian[{impl}] r={rr}", r.ms, r.gpix_s,
                      _maxdiff(out, ref), 1e-4)
        if args.src:
            imwrite(_out_path(args.src, f"gauss_{impl}"),
                    np.clip(out * 255, 0, 255).astype(np.uint8))
    return ok


def cmd_integral(args):
    import jax.numpy as jnp

    import tpuimg
    from tpuimg.oracle import integral_ref

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (args.height, args.width), dtype=np.uint8)
    ref = integral_ref(img)
    x = jnp.asarray(img)
    ok = True
    for impl in ("xla", "pallas"):
        fn = lambda v: tpuimg.integral(v, impl=impl)
        out = np.asarray(fn(x))
        r = _time(fn, x, args.nreps, img.size)
        ok &= _report(f"integral[{impl}]", r.ms, r.gpix_s, _maxdiff(out, ref), 0)
    return ok


def _autotest(args, run_one, tag, tol: float = 0.0):
    """Randomized-shape property loop (reference autoTestDemo,
    Integral/main.cpp:154-237), appending one line per run to res.log.
    `run_one(rng, h, w) -> (desc, diff[, tol])`; integer ops require
    diff == 0, float/quantized ops pass `tol` (e.g. 1 gray step for CLAHE).
    A 3-tuple return overrides the family tolerance for that run (mixed-mode
    families: the guided shrink/CN1 class paths carry the 1e-3 float
    contract, the fused reflect path the tighter 1e-4)."""
    rng = np.random.default_rng(args.seed)
    failures = 0
    done = 0
    deadline = getattr(args, "deadline", 0)
    with open("res.log", "a") as log:
        for _ in range(args.runs):
            if deadline and time.time() >= deadline:
                # cooperative stop between runs: a TPU process must never
                # be signal-killed mid-run (wedges the device lease ~10 min)
                print(f"deadline reached after {done} runs", flush=True)
                break
            h = int(rng.integers(64, args.max_size))
            w = int(rng.integers(64, args.max_size))
            res = run_one(rng, h, w)
            desc, diff = res[0], res[1]
            rtol = res[2] if len(res) > 2 else tol
            line = (f"Size: {w} x {h}, Max difference of tpuimg{tag}{desc} "
                    f"and oracle: {diff:g}")
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
            failures += diff > rtol
            done += 1
    word = "exact" if tol == 0 else f"within {tol:g}"
    print(f"{done - failures}/{done} {word}")
    return failures == 0


def _bucket_shape(args, h, w):
    """Round a drawn shape up to --bucket multiples (compile amortization —
    see cmd_integral_autotest). Unlike the integral's zero-embed (which
    additionally proves the trailing-zero slice identity), the generic form
    fills the WHOLE bucketed frame with random content: the device op and
    the oracle consume the identical frame, so the per-run contract is
    unchanged — only the shape-draw space is quantized onto the lattice
    (off-lattice shapes remain covered by unbucketed runs, and the log line
    records the bucketed shape)."""
    if not getattr(args, "bucket", 0):
        return h, w, ""
    hp = -(-h // args.bucket) * args.bucket
    wp = -(-w // args.bucket) * args.bucket
    return hp, wp, f" (bucket {wp} x {hp})"


def cmd_integral_autotest(args):
    """--bucket N embeds the drawn frame in a zero-padded frame whose sides
    are multiples of N before the device op. Exact by construction: an
    integral image's top-left h×w region is unchanged by trailing zero
    rows/cols, and the FULL padded output is still verified against the
    oracle of the padded frame, so nothing is checked more loosely than the
    unbucketed protocol. The point is compile amortization: every fresh
    shape costs a fresh XLA+Mosaic compile (~4-45 s on this runtime, where
    the reference's CUDA binary serves all shapes); bucketing maps the
    [64, max_size) draw space onto ~(max_size/N)^2 compiled programs that
    the persistent cache then serves, making reference-scale run counts
    (Integral/res.log: 3000) feasible."""
    import tpuimg
    from tpuimg.oracle import integral_ref

    def run_one(rng, h, w):
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        if args.bucket:
            hp = -(-h // args.bucket) * args.bucket
            wp = -(-w // args.bucket) * args.bucket
            frame = np.zeros((hp, wp), np.uint8)
            frame[:h, :w] = img
            out = np.asarray(tpuimg.integral(frame, impl=args.impl))
            diff = _maxdiff(out, integral_ref(frame))
            # implied mathematically; cheap insurance on the slice identity
            diff = max(diff, _maxdiff(out[:h, :w], integral_ref(img)))
            return f" (bucket {wp} x {hp})", diff
        return "", _maxdiff(tpuimg.integral(img, impl=args.impl),
                            integral_ref(img))

    return _autotest(args, run_one, "")


def cmd_he_autotest(args):
    import tpuimg
    from tpuimg.oracle import hist_equalize_ref

    def run_one(rng, h, w):
        h, w, bdesc = _bucket_shape(args, h, w)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        return bdesc, _maxdiff(tpuimg.hist_equalize(img),
                               hist_equalize_ref(img))

    return _autotest(args, run_one, "-he")


def cmd_morph_autotest(args):
    import tpuimg
    from tpuimg.oracle import dilate_ref, erode_ref

    def run_one(rng, h, w):
        h, w, bdesc = _bucket_shape(args, h, w)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        r = int(rng.integers(1, args.max_radius + 1))
        if args.bucket:
            # radius is a static arg (fresh Mosaic compile per value); in
            # bucketed mode snap the draw onto a ladder spanning all three
            # dispatch regimes (fused strip / van Herk / large-r) so the
            # persistent cache can serve reference-scale run counts
            ladder = (1, 2, 4, 7, 12, 20, 31)
            r = max(v for v in ladder if v <= max(r, 1))
        if rng.integers(2):
            diff = _maxdiff(tpuimg.dilate(img, r), dilate_ref(img, r))
            return f"-dilate r{r}{bdesc}", diff
        diff = _maxdiff(tpuimg.erode(img, r), erode_ref(img, r))
        return f"-erode r{r}{bdesc}", diff

    return _autotest(args, run_one, "")


def cmd_clahe_autotest(args):
    """CLAHE truth is the line-by-line oracle; quantization to u8 makes the
    contract ≤1 gray step, not exact (KNOWN_DIVERGENCES)."""
    import tpuimg
    from tpuimg.oracle import clahe_ref

    def run_one(rng, h, w):
        h, w, bdesc = _bucket_shape(args, h, w)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        xt = int(rng.integers(2, 9))
        yt = int(rng.integers(2, 9))
        clip = float(rng.uniform(1.0, 60.0))
        if args.bucket:
            # clip_limit AND the tile grid are static args (fresh compile
            # per combo); in bucketed mode draw all three from ladders so
            # the program space stays small enough for the persistent
            # cache to serve reference-scale run counts (the unbucketed
            # path keeps the full random param space)
            # round 4: the CLAHE kernel rework invalidated the compile
            # cache, so the bucketed program space must stay ~24 programs
            # (each cold clahe compile is minutes on this runtime)
            grids = ((2, 2), (4, 4), (8, 8))
            xt, yt = grids[int(rng.integers(len(grids)))]
            ladder = (2.0, 40.0)
            clip = ladder[int(rng.integers(len(ladder)))]
        # centered padding must satisfy the dLimitSize reflect bound
        # (ops/histogram geometry validation); skip invalid grid draws
        from tpuimg.core.validate import TpuImgError

        try:
            got = tpuimg.clahe(img, clip, xt, yt)
        except TpuImgError:
            return f"-clahe {xt}x{yt} (skipped: invalid grid){bdesc}", 0.0
        return (f"-clahe {xt}x{yt} clip{clip:.1f}{bdesc}",
                _maxdiff(got, clahe_ref(img, clip, xt, yt)))

    return _autotest(args, run_one, "", tol=1.0)


def cmd_gaussian_autotest(args):
    import tpuimg
    from tpuimg.oracle import gaussian_ref

    def run_one(rng, h, w):
        h, w, bdesc = _bucket_shape(args, h, w)
        img = rng.random((h, w), dtype=np.float32)
        r = int(rng.integers(1, 8))
        sigma = float(rng.uniform(0.5, 3.0))
        if args.bucket:
            # (r, sigma) are static args (fresh compile per pair); in
            # bucketed mode snap onto a joint ladder covering every radius
            # so the program space is 7·buckets, not 35·buckets
            pairs = ((1, 0.5), (2, 1.0), (3, 1.5), (4, 1.0),
                     (5, 2.0), (6, 3.0), (7, 2.0))
            r, sigma = pairs[r - 1]
        got = tpuimg.gaussian(img, r, sigma)
        return (f"-gauss r{r} s{sigma:g}{bdesc}",
                _maxdiff(got, gaussian_ref(img, r, sigma)))

    return _autotest(args, run_one, "", tol=1e-5)


def cmd_guided_autotest(args):
    import tpuimg
    from tpuimg.oracle import guided_filter_ref

    def run_one(rng, h, w):
        h, w, bdesc = _bucket_shape(args, h, w)
        I = rng.random((h, w), dtype=np.float32)
        r = int(rng.integers(1, 17))
        if args.bucket:
            # radius is a static arg; ladder it in bucketed mode (covers
            # the r1-16 fused ladder endpoints + the mid rungs)
            ladder = (1, 2, 3, 4, 8, 12, 16)
            r = max(v for v in ladder if v <= r)
        if min(h, w) <= 2 * r:  # fused-path geometry bound
            r = max(1, min(h, w) // 2 - 1)
        # round 5 (VERDICT r4 item 5): the randomized record also covers the
        # reference's CLASS-path semantics — shrink-window border and the
        # CN1 3-channel-source/gray-guide variant
        # (GuidedFilter/guided_filter.cpp:28-66) — not just the fused
        # reflect-101 path. Those run the f32 cumsum-based XLA chain, whose
        # contract tolerance is 1e-3 (BASELINE.json); the fused reflect
        # path keeps the tighter 1e-4.
        mode = ("reflect", "shrink", "cn1", "reflect")[int(rng.integers(4))]
        if mode == "cn1":
            p = rng.random((3, h, w), dtype=np.float32)
            got = tpuimg.guided_filter(I, p, r, 1e-3, border="shrink")
            ref = np.stack([
                guided_filter_ref(I, pc, r, 1e-3, border="shrink")
                for pc in p])
            return f"-guided-cn1 r{r}{bdesc}", _maxdiff(got, ref), 1e-3
        p = rng.random((h, w), dtype=np.float32)
        if mode == "shrink":
            got = tpuimg.guided_filter(I, p, r, 1e-3, border="shrink")
            ref = guided_filter_ref(I, p, r, 1e-3, border="shrink")
            return f"-guided r{r} shrink{bdesc}", _maxdiff(got, ref), 1e-3
        got = tpuimg.guided_filter(I, p, r, 1e-3, border="reflect101")
        ref = guided_filter_ref(I, p, r, 1e-3, border="reflect101")
        return f"-guided r{r}{bdesc}", _maxdiff(got, ref)

    return _autotest(args, run_one, "", tol=1e-4)


def cmd_enhance_autotest(args):
    """Randomized parity for the flagship fused pipeline: enhance(img)
    (f32 CLAHE bridge + one-kernel gaussian+guided tail) vs the composed
    NumPy oracles. CLAHE's own contract is ≤1 gray step; the downstream
    chain is an average-of-averages (non-expanding), so the end-to-end
    contract is ≤2 steps after the final rint."""
    import tpuimg
    from tpuimg.oracle import clahe_ref, gaussian_ref, guided_filter_ref
    from tpuimg.pipeline import enhance

    def run_one(rng, h, w):
        h, w, bdesc = _bucket_shape(args, h, w)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got = np.asarray(enhance(img))
        eq = clahe_ref(img, 2.0, 8, 8)
        f = eq.astype(np.float32) / np.float32(255.0)
        sm = gaussian_ref(f, 2, 1.5)
        q = guided_filter_ref(f, sm, 8, 1e-3, border="reflect101")
        ref = np.clip(np.rint(q * 255.0), 0, 255).astype(np.uint8)
        return f"-enhance{bdesc}", _maxdiff(got, ref)

    return _autotest(args, run_one, "", tol=2.0)


def cmd_enhance(args):
    """Flagship pipeline demo: CLAHE → gaussian → guided on one frame,
    the fused and staged impls timed side by side and verified against the
    composed NumPy oracles — the chain the reference cannot run in one
    program (each of its demos is a separate executable with host
    round-trips between them, SURVEY.md §3)."""
    import jax.numpy as jnp

    from tpuimg.oracle import clahe_ref, gaussian_ref, guided_filter_ref
    from tpuimg.pipeline import enhance
    from tpuimg.utils import imwrite

    img = _load_or_random(args.image, args.width, args.height, np.uint8)
    eq = clahe_ref(img, args.clip, args.tiles, args.tiles)
    f = eq.astype(np.float32) / np.float32(255.0)
    sm = gaussian_ref(f, args.radius, args.sigma)
    q = guided_filter_ref(f, sm, args.gf_radius, args.gf_eps,
                          border="reflect101")
    ref = np.clip(np.rint(q * 255.0), 0, 255).astype(np.uint8)

    x = jnp.asarray(img)
    ok = True
    # 3-rung ladder: default 2-launch fused, the opt-in single-launch
    # fused1 (loses 0.11 ms at 4K — docs/PERFORMANCE.md round-5 probe),
    # and the user-composable staged form
    for impl in ("fused", "fused1", "staged"):
        fn = lambda v: enhance(v, args.clip, args.tiles, args.radius,
                               args.sigma, args.gf_radius, args.gf_eps,
                               impl=impl)
        out = np.asarray(fn(x))
        r = _time(fn, x, args.nreps, img.size)
        # both impls share the enhance-autotest <=2-step contract: CLAHE's
        # permitted 1-step deviation propagated through the tail can cross
        # an rint boundary even on the staged path (ADVICE r4)
        ok &= _report(f"enhance[{impl}]", r.ms, r.gpix_s,
                      _maxdiff(out, ref), 2)
        if args.image:
            imwrite(_out_path(args.image, f"enhance_{impl}"), out)
    return ok


def cmd_he(args):
    import tpuimg
    from tpuimg.oracle import hist_equalize_ref
    from tpuimg.utils import imread_gray, imwrite

    img = imread_gray(args.image)
    out = np.asarray(tpuimg.hist_equalize(img))
    diff = _maxdiff(out, hist_equalize_ref(img))
    r = _time(tpuimg.hist_equalize, img, args.nreps, img.size)
    ok = _report("hist_equalize", r.ms, r.gpix_s, diff, 0)
    imwrite(_out_path(args.image, "tpuhe"), out)
    return ok


def cmd_clahe(args):
    import jax.numpy as jnp

    import tpuimg
    from tpuimg.oracle import clahe_ref
    from tpuimg.utils import imread_gray, imread_rgb, imwrite

    from tpuimg.core.params import ClaheConfig

    cfg = ClaheConfig(clip_limit=args.clip, xtiles=args.xtiles,
                      ytiles=args.ytiles)
    try:
        rgb = imread_rgb(args.image)
        # image decoders hand back (H, W, 3) even for grayscale sources, so
        # ndim alone cannot detect color — check the channels actually
        # differ (a gray PNG through the Lab round-trip would shift values
        # by several levels; round-2 review)
        color = rgb.ndim == 3 and int(np.ptp(rgb, axis=-1).max()) > 0
        if not color and rgb.ndim == 3:
            rgb = rgb[..., 0]
    except Exception:
        rgb, color = None, False
    if color:
        # reference claheDemo: BGR→Lab, CLAHE on L, merge back — but here the
        # whole chain runs on device (ops/color.py)
        from tpuimg.ops.color import lab_to_rgb, rgb_to_lab

        lab = rgb_to_lab(jnp.asarray(rgb))
        L = lab[..., 0]
        Leq = tpuimg.clahe(L, cfg.clip_limit, cfg.xtiles, cfg.ytiles)
        out_rgb = np.asarray(lab_to_rgb(jnp.stack(
            [Leq, lab[..., 1], lab[..., 2]], axis=-1)))
        imwrite(_out_path(args.image, "tpuclahe"), out_rgb)
        L_np = np.asarray(L)
        got = np.asarray(Leq)
    else:
        L_np = rgb if rgb is not None else imread_gray(args.image)
        got = np.asarray(tpuimg.clahe(L_np, cfg.clip_limit, cfg.xtiles,
                                      cfg.ytiles))
        imwrite(_out_path(args.image, "tpuclahe"), got)

    ref = clahe_ref(L_np, cfg.clip_limit, cfg.xtiles, cfg.ytiles)
    fn = lambda v: tpuimg.clahe(v, cfg.clip_limit, cfg.xtiles, cfg.ytiles)
    r = _time(fn, jnp.asarray(L_np), args.nreps, L_np.size)
    return _report("clahe", r.ms, r.gpix_s, _maxdiff(got, ref), 1)


def cmd_guided(args):
    import jax.numpy as jnp

    import tpuimg
    from tpuimg.oracle import guided_filter_ref
    from tpuimg.utils import imwrite

    from tpuimg.core.validate import ParamError

    src = _load_or_random(args.src, args.width, args.height, np.float32)
    guide = _load_or_random(args.guide or args.src, args.width, args.height,
                            np.float32)
    if guide.shape != src.shape:
        raise ParamError(
            f"guide {guide.shape} and src {src.shape} must match; pass both "
            f"--src and --guide as same-sized images"
        )
    ref = guided_filter_ref(guide, src, args.radius, args.eps,
                            border="reflect101")
    from tpuimg.core.params import GuidedConfig

    I, p = jnp.asarray(guide), jnp.asarray(src)
    ok = True
    # the full runnable impl ladder, like the reference keeps every gaussian
    # rung runnable in one harness (gaussian.cu:409-663): XLA box chain,
    # the reference-shaped two-kernel split (gCalcAB/gWeightByABm with A/B
    # through HBM), and the shipped one-pass fused kernel
    from tpuimg.kernels.boxsum import guided_filter_pallas

    rungs = [
        ("xla", lambda v: tpuimg.guided_filter(
            v, p, args.radius, args.eps, border="reflect101", impl="xla")),
        ("pallas-twopass", lambda v: guided_filter_pallas(
            v, p, args.radius, args.eps, variant="twopass")),
        ("pallas-onepass", lambda v: guided_filter_pallas(
            v, p, args.radius, args.eps, variant="onepass")),
    ]
    for impl, fn in rungs:
        cfg = GuidedConfig(radius=args.radius, eps=args.eps,
                           border="reflect101",
                           impl=impl.split("-")[0])
        out = np.asarray(fn(I))
        r = _time(fn, I, args.nreps, src.size)
        ok &= _report(f"guided[{impl}] r={cfg.radius}", r.ms, r.gpix_s,
                      _maxdiff(out, ref), 1e-3)
        if args.src:
            imwrite(_out_path(args.src, f"guided_{impl}"),
                    np.clip(out * 255, 0, 255).astype(np.uint8))
    return ok


def cmd_morphology(args):
    import jax.numpy as jnp

    import tpuimg
    from tpuimg.oracle import close_ref, dilate_ref, erode_ref, open_ref
    from tpuimg.utils import imwrite

    ops = {
        "erode": (tpuimg.erode, erode_ref),
        "dilate": (tpuimg.dilate, dilate_ref),
        # impl must reach the op: dropping it here mislabeled the CLI's
        # "[xla]" open/close rows as XLA while running the auto (Pallas) path
        "open": (tpuimg.morph_open, open_ref),
        "close": (tpuimg.morph_close, close_ref),
    }
    from tpuimg.core.params import MorphConfig

    cfg = MorphConfig(radius=args.radius, mode=args.mode)
    name = args.op if args.op else ("erode" if cfg.mode == 0 else "dilate")
    op, ref_fn = ops[name]

    if args.color != "gray" and args.src:
        # reference morphologyRGBDemo (per-channel, main.cpp:113-177) /
        # morphologyLABDemo (L channel only, :180-242) — all on device here
        from tpuimg.utils import imread_rgb

        rgb = jnp.asarray(imread_rgb(args.src))
        if args.color == "rgb":
            chans = jnp.moveaxis(rgb, -1, 0)  # (3, H, W) batch via vmap
            out = np.moveaxis(np.asarray(op(chans, args.radius)), 0, -1)
        else:  # lab
            from tpuimg.ops.color import lab_to_rgb, rgb_to_lab

            lab = rgb_to_lab(rgb)
            L = op(lab[..., 0], args.radius)
            out = np.asarray(lab_to_rgb(jnp.stack(
                [L, lab[..., 1], lab[..., 2]], axis=-1)))
        imwrite(_out_path(args.src, f"morph_{name}_{args.color}"), out)
        print(f"wrote {args.color} {name} result")
        return True

    img = _load_or_random(args.src, args.width, args.height, np.uint8)
    ref = ref_fn(img, cfg.radius)
    x = jnp.asarray(img)
    ok = True
    # the doubling-window Pallas engine covers every radius (round 2)
    impls = ("xla", "pallas")
    for impl in impls:
        fn = lambda v: op(v, cfg.radius, impl=impl)
        out = np.asarray(fn(x))
        r = _time(fn, x, args.nreps, img.size)
        ok &= _report(f"morph[{impl}] {name} r={cfg.radius}",
                      r.ms, r.gpix_s, _maxdiff(out, ref), 0)
        if args.src:
            imwrite(_out_path(args.src, f"morph_{impl}_{name}"), out)
    return ok


def cmd_sweep(args):
    """Parameter sweeps (reference GuidedFilter/run.py, Morphology/
    plot_time.py protocols); writes JSON results."""
    import jax.numpy as jnp

    import tpuimg

    if "," in args.radii:  # explicit list, e.g. "1,2,4,8,15,30"
        radii = [int(v) for v in args.radii.split(",")]
    else:  # range, e.g. "1-30"
        parts = args.radii.split("-")
        radii = list(range(int(parts[0]), int(parts[-1]) + 1))
    rng = np.random.default_rng(0)
    img_f = jnp.asarray(rng.random((args.height, args.width), dtype=np.float32))
    img_u = jnp.asarray(rng.integers(0, 256, (args.height, args.width),
                                     dtype=np.uint8))
    results = []
    for r in radii:
        if args.op == "gaussian":
            fn, arg = (lambda v, r=r: tpuimg.gaussian(v, r, 1.0)), img_f
        elif args.op == "guided":
            fn, arg = (lambda v, r=r: tpuimg.guided_filter(
                v, v, r, 0.3, border="reflect101")), img_f
        else:
            fn, arg = (lambda v, r=r: tpuimg.erode(v, r)), img_u
        t = _time(fn, arg, args.nreps, args.width * args.height)
        results.append({"radius": r, "ms": t.ms, "gpix_s": t.gpix_s})
        print(f"radius {r:2d}: {t.ms:9.3f} ms  {t.gpix_s:8.2f} GPix/s")
    out = os.path.join(args.out_dir, f"sweep_{args.op}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")
    if args.plot:
        # latency-vs-radius plot (the reference's plot_time.py output)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot([r["radius"] for r in results], [r["ms"] for r in results],
                marker="o")
        ax.set_xlabel("radius")
        ax.set_ylabel("ms / frame")
        ax.set_title(f"{args.op} {args.width}x{args.height}")
        fig.tight_layout()
        png = os.path.join(args.out_dir, f"sweep_{args.op}.png")
        fig.savefig(png, dpi=120)
        print(f"wrote {png}")
    return True


def cmd_stream(args):
    """End-to-end streaming: native threaded decode → device pipeline → PNG.

    The production-serving shape: the C++ prefetcher (tpuimg.native) decodes
    ahead on worker threads while the device runs the fused pipeline, so
    decode, transfer, and compute overlap.
    """
    import glob as globmod
    import time

    import jax.numpy as jnp

    import tpuimg
    from tpuimg import native
    from tpuimg.pipeline import enhance

    paths = sorted(globmod.glob(args.pattern))
    if not paths:
        print(f"no files match {args.pattern}")
        return False
    os.makedirs(args.out, exist_ok=True)

    ops = {
        "enhance": lambda x: enhance(x),
        "clahe": lambda x: tpuimg.clahe(x, args.clip, 8, 8),
        "he": tpuimg.hist_equalize,
        "erode": lambda x: tpuimg.erode(x, args.radius),
        "gaussian": lambda x: jnp.clip(
            jnp.rint(
                tpuimg.gaussian(x.astype(jnp.float32) / 255.0, args.radius, 1.5)
                * 255.0
            ), 0, 255,
        ).astype(jnp.uint8),  # rint+clip: the library's float->u8 convention
    }
    fn = ops[args.op]

    t0 = time.perf_counter()
    n = 0
    pending = None  # 1-deep pipeline: device computes frame i while the
    # host encodes frame i-1 (JAX dispatch is async; np.asarray forces)
    with native.FrameStream(paths, (args.height, args.width), gray=True,
                            threads=args.threads) as fs:
        for idx, frame in fs:
            result = fn(jnp.asarray(frame))
            if pending is not None:
                pidx, pres = pending
                base = os.path.splitext(os.path.basename(paths[pidx]))[0]
                native.write_png(  # output is PNG regardless of input ext
                    os.path.join(args.out, base + ".png"), np.asarray(pres))
                n += 1
            pending = (idx, result)
        if pending is not None:
            pidx, pres = pending
            base = os.path.splitext(os.path.basename(paths[pidx]))[0]
            native.write_png(  # PNG name like every in-loop frame
                os.path.join(args.out, base + ".png"), np.asarray(pres))
            n += 1
    dt = time.perf_counter() - t0
    print(f"processed {n} frames ({args.width}x{args.height}, op={args.op}) "
          f"in {dt:.2f}s = {n / dt:.2f} fps end-to-end")
    return True


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpuimg", description=__doc__)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (this environment pins "
                        "JAX_PLATFORMS, so an env var alone is not enough)")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gaussian")
    g.add_argument("width", type=int, nargs="?", default=3840)
    g.add_argument("height", type=int, nargs="?", default=2160)
    g.add_argument("radius", type=int, nargs="?", default=1)
    g.add_argument("sigma", type=float, nargs="?", default=1.0)
    g.add_argument("nreps", type=int, nargs="?", default=20)
    g.add_argument("src", nargs="?", default=None)
    g.set_defaults(fn=cmd_gaussian)

    i = sub.add_parser("integral")
    i.add_argument("--width", type=int, default=3840)
    i.add_argument("--height", type=int, default=2160)
    i.add_argument("--nreps", type=int, default=20)
    i.set_defaults(fn=cmd_integral)

    a = sub.add_parser("integral-autotest")
    a.add_argument("--runs", type=int, default=10)
    # 6000 matches the reference autoTestDemo range (Integral/main.cpp:193)
    # and covers the wide-frame carry regime (carry > 2^20 beyond 4224 px)
    a.add_argument("--max-size", type=int, default=6000)
    a.add_argument("--seed", type=int, default=0)
    a.add_argument("--impl", default="pallas", choices=["xla", "pallas"])
    # 0 = off; 512 keeps the compiled-program count near 12x12 over the
    # default [64, 6000) range (see cmd_integral_autotest docstring)
    a.add_argument("--bucket", type=int, default=0)
    # cooperative stop (epoch seconds), checked between runs — never
    # signal-kill a TPU process (verify skill: wedges the lease ~10 min)
    a.add_argument("--deadline", type=int, default=0)
    a.set_defaults(fn=cmd_integral_autotest)

    ah = sub.add_parser("he-autotest")
    ah.add_argument("--runs", type=int, default=10)
    ah.add_argument("--max-size", type=int, default=6000)
    ah.add_argument("--seed", type=int, default=0)
    ah.add_argument("--bucket", type=int, default=0)
    ah.add_argument("--deadline", type=int, default=0)
    ah.set_defaults(fn=cmd_he_autotest)

    am = sub.add_parser("morph-autotest")
    am.add_argument("--runs", type=int, default=10)
    am.add_argument("--max-size", type=int, default=4000)
    am.add_argument("--max-radius", type=int, default=31)
    am.add_argument("--seed", type=int, default=0)
    am.add_argument("--bucket", type=int, default=0)
    am.add_argument("--deadline", type=int, default=0)
    am.set_defaults(fn=cmd_morph_autotest)

    for nm, fun, mx in [("clahe-autotest", cmd_clahe_autotest, 4000),
                        ("gaussian-autotest", cmd_gaussian_autotest, 4000),
                        ("guided-autotest", cmd_guided_autotest, 3000),
                        ("enhance-autotest", cmd_enhance_autotest, 3000)]:
        ax = sub.add_parser(nm)
        ax.add_argument("--runs", type=int, default=10)
        ax.add_argument("--max-size", type=int, default=mx)
        ax.add_argument("--seed", type=int, default=0)
        ax.add_argument("--bucket", type=int, default=0)
        ax.add_argument("--deadline", type=int, default=0)
        ax.set_defaults(fn=fun)

    e = sub.add_parser("he")
    e.add_argument("image")
    e.add_argument("--nreps", type=int, default=20)
    e.set_defaults(fn=cmd_he)

    en = sub.add_parser("enhance")
    en.add_argument("image", nargs="?", default=None)
    en.add_argument("--width", type=int, default=3840)
    en.add_argument("--height", type=int, default=2160)
    en.add_argument("--clip", type=float, default=2.0)
    en.add_argument("--tiles", type=int, default=8)
    en.add_argument("--radius", type=int, default=2)
    en.add_argument("--sigma", type=float, default=1.5)
    en.add_argument("--gf-radius", type=int, default=8)
    en.add_argument("--gf-eps", type=float, default=1e-3)
    en.add_argument("--nreps", type=int, default=20)
    en.set_defaults(fn=cmd_enhance)

    c = sub.add_parser("clahe")
    c.add_argument("image")
    c.add_argument("--clip", type=float, default=1.0)
    c.add_argument("--xtiles", type=int, default=8)
    c.add_argument("--ytiles", type=int, default=8)
    c.add_argument("--nreps", type=int, default=20)
    c.set_defaults(fn=cmd_clahe)

    u = sub.add_parser("guided")
    u.add_argument("--radius", type=int, default=4)
    u.add_argument("--eps", type=float, default=0.3)
    u.add_argument("--nreps", type=int, default=20)
    u.add_argument("--width", type=int, default=3840)
    u.add_argument("--height", type=int, default=2160)
    u.add_argument("--src", default=None)
    u.add_argument("--guide", default=None)
    u.set_defaults(fn=cmd_guided)

    m = sub.add_parser("morphology")
    m.add_argument("--radius", type=int, default=5)
    m.add_argument("--mode", type=int, default=0, choices=[0, 1])
    m.add_argument("--op", default=None,
                   choices=["erode", "dilate", "open", "close"])
    m.add_argument("--color", default="gray", choices=["gray", "rgb", "lab"])
    m.add_argument("--nreps", type=int, default=20)
    m.add_argument("--width", type=int, default=3840)
    m.add_argument("--height", type=int, default=2160)
    m.add_argument("--src", default=None)
    m.set_defaults(fn=cmd_morphology)

    s = sub.add_parser("sweep")
    s.add_argument("op", choices=["gaussian", "guided", "morphology"])
    s.add_argument("--radii", default="1-7")
    s.add_argument("--nreps", type=int, default=20)
    s.add_argument("--width", type=int, default=3840)
    s.add_argument("--height", type=int, default=2160)
    s.add_argument("--plot", action="store_true")
    s.add_argument("--out-dir", default=".")
    s.set_defaults(fn=cmd_sweep)

    st = sub.add_parser("stream")
    st.add_argument("pattern", help="glob of input images")
    st.add_argument("--op", default="enhance",
                    choices=["enhance", "clahe", "he", "erode", "gaussian"])
    st.add_argument("--out", default="stream_out")
    st.add_argument("--width", type=int, default=1920)
    st.add_argument("--height", type=int, default=1080)
    st.add_argument("--radius", type=int, default=3)
    st.add_argument("--clip", type=float, default=2.0)
    st.add_argument("--threads", type=int, default=4)
    st.set_defaults(fn=cmd_stream)

    args = p.parse_args(argv)
    import jax

    # persistent compile cache: autotest sweeps re-visit padded geometries
    # across runs and sessions; recompiling a 6000-px-wide Mosaic kernel
    # costs ~45 s, a cache hit is ~free. Default to a user cache dir — the
    # package dir may be a read-only site-packages install; override with
    # TPUIMG_CACHE_DIR (e.g. a repo-local .jax_cache for development)
    cache_dir = os.environ.get(
        "TPUIMG_CACHE_DIR", os.path.expanduser("~/.cache/tpuimg/jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    _device_banner()
    from tpuimg.core.validate import TpuImgError

    try:
        ok = args.fn(args)
    except TpuImgError as e:
        # config dataclasses / op validation reject bad parameters with
        # typed errors; surface them as a clean CLI failure (the reference
        # CHECK-macro exit(-1) analog, Histogram/cuda_utils.h:7-36)
        print(f"tpuimg: invalid parameters: {e}", file=sys.stderr)
        return 2
    return 0 if ok else 1


def _device_banner():
    """Report the device before running (the reference's initDevice,
    Integral/cuda_utils.h:94-120)."""
    import jax

    devs = jax.devices()
    print(f"tpuimg: backend={jax.default_backend()} devices={len(devs)} "
          f"[{devs[0].device_kind}]", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
