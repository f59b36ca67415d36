"""Pallas kernel parity (interpreter mode on the CPU backend — SURVEY.md §5
"keep interpret-mode Pallas tests")."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuimg import dilate, erode, gaussian, guided_filter, integral
from tpuimg.oracle import (
    dilate_ref,
    erode_ref,
    gaussian_ref,
    guided_filter_ref,
    integral_ref,
)


@pytest.mark.parametrize("shape", [(64, 128), (300, 700), (33, 1111)])
def test_integral_pallas_exact(rng, shape):
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = np.asarray(integral(img, impl="pallas"))
    np.testing.assert_array_equal(out, integral_ref(img))


@pytest.mark.parametrize("radius,sigma", [(1, 1.0), (3, 2.0), (7, 3.0)])
def test_gaussian_pallas(rng, radius, sigma):
    img = rng.random((100, 300), dtype=np.float32)
    out = np.asarray(gaussian(img, radius, sigma, impl="pallas"))
    assert np.abs(out - gaussian_ref(img, radius, sigma)).max() < 1e-5


@pytest.mark.parametrize("radius", [1, 2, 6, 8, 15, 25, 31])
def test_morph_pallas_exact(rng, radius):
    # all radii run the ONE doubling-window engine (round 2): the reference's
    # gMorphSplit/van Herk/Gil-Werman ladder collapsed (image_process.cu:465)
    img = rng.integers(0, 256, (75, 183), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(erode(img, radius, impl="pallas")), erode_ref(img, radius)
    )
    np.testing.assert_array_equal(
        np.asarray(dilate(img, radius, impl="pallas")), dilate_ref(img, radius)
    )


@pytest.mark.parametrize("radius", [1, 3, 8, 15])
def test_open_close_pallas_exact(rng, radius):
    """Fused single-pass open/close == composed erode/dilate, including the
    border clamp of the intermediate (and 2r > h shapes)."""
    from tpuimg.kernels.sep_stencil import open_close_pallas

    from tpuimg.oracle import close_ref, open_ref

    for shape in [(97, 201), (15, 33)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        # pure NumPy oracles — a reference built from the xla ops under
        # test would hide a border bug shared between implementations
        np.testing.assert_array_equal(
            np.asarray(open_close_pallas(img, radius, 0)),
            open_ref(img, radius))
        np.testing.assert_array_equal(
            np.asarray(open_close_pallas(img, radius, 1)),
            close_ref(img, radius))


def test_hist256_pallas_exact(rng):
    from tpuimg.kernels.hist import hist256_groups_pallas, hist256_pallas

    img = rng.integers(0, 256, (123, 517), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(hist256_pallas(img)),
        np.bincount(img.ravel(), minlength=256),
    )
    groups = rng.integers(0, 256, (7, 1333), dtype=np.uint8)
    got = np.asarray(hist256_groups_pallas(groups))
    for t in range(7):
        np.testing.assert_array_equal(
            got[t], np.bincount(groups[t], minlength=256))


def test_hist256_frames_rowband_exact(rng):
    """The frame-shaped batched-HE hist path (round 5: per-frame 32-row
    bands, row-append pad) must count exactly — including frames needing
    both row (H % 32) and lane (W % 128) padding."""
    from tpuimg.kernels.hist import hist256_frames_pallas

    frames = rng.integers(0, 256, (5, 45, 173), dtype=np.uint8)
    got = np.asarray(hist256_frames_pallas(frames))
    for t in range(5):
        np.testing.assert_array_equal(
            got[t], np.bincount(frames[t].ravel(), minlength=256))


def test_hist256_groups_split_path_exact(rng, monkeypatch):
    """Groups above _MAX_GROUP split into int32-summed subgroups so the f32
    MXU accumulation can't round (an 8K frame is one 33 MPix group in the
    batched-HE path) — exercised here with a shrunken threshold."""
    from tpuimg.kernels import hist

    monkeypatch.setattr(hist, "_MAX_GROUP", 4096)
    groups = rng.integers(0, 256, (3, 10000), dtype=np.uint8)
    got = np.asarray(hist.hist256_groups_pallas(groups))
    for t in range(3):
        np.testing.assert_array_equal(
            got[t], np.bincount(groups[t], minlength=256))


def test_lut_gather_float_table_bit_exact(rng):
    from tpuimg.kernels.lut import lut_gather

    table = rng.random(256).astype(np.float32) * 255.0
    img = rng.integers(0, 256, (40, 140), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(lut_gather(table, img)),
                                  table[img])


@pytest.mark.parametrize("radius,eps", [(1, 0.3), (7, 1e-3), (8, 1e-3)])
def test_guided_pallas(rng, radius, eps):
    I = rng.random((64, 200), dtype=np.float32)
    p = np.clip(I + 0.1 * rng.standard_normal(I.shape), 0, 1).astype(np.float32)
    out = np.asarray(guided_filter(I, p, radius, eps, border="reflect101",
                                   impl="pallas"))
    ref = guided_filter_ref(I, p, radius, eps, border="reflect101")
    assert np.abs(out - ref).max() < 1e-3


def test_guided_pallas_variants_agree(rng):
    # onepass (single kernel, halo recompute) vs twopass (reference's
    # gCalcAB/gWeightByABm shape) must match to float noise
    from tpuimg.kernels.boxsum import guided_filter_pallas

    I = rng.random((48, 300), dtype=np.float32)
    p = rng.random((48, 300), dtype=np.float32)
    one = np.asarray(guided_filter_pallas(I, p, 8, 1e-3, variant="onepass"))
    two = np.asarray(guided_filter_pallas(I, p, 8, 1e-3, variant="twopass"))
    assert np.abs(one - two).max() < 1e-5


def test_gaussian_pallas_batched(rng):
    imgs = rng.random((2, 64, 96), dtype=np.float32)
    out = np.asarray(gaussian(imgs, 2, 1.5, impl="pallas"))
    for i in range(2):
        assert np.abs(out[i] - gaussian_ref(imgs[i], 2, 1.5)).max() < 1e-5


@pytest.mark.parametrize("shape", [(90, 110), (128, 256)])
def test_he_gather_lut_exact(rng, shape):
    from tpuimg import hist_equalize
    from tpuimg.oracle import hist_equalize_ref

    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = np.asarray(hist_equalize(img, impl="pallas"))
    np.testing.assert_array_equal(out, hist_equalize_ref(img))


def test_clahe_gather_map_exact(rng):
    from tpuimg import clahe
    from tpuimg.oracle import clahe_ref

    img = rng.integers(0, 256, (100, 140), dtype=np.uint8)
    out = np.asarray(clahe(img, 30.0, 5, 3, impl="pallas"))
    ref = clahe_ref(img, 30.0, 5, 3)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1



# --- in-kernel border handling (round 3: no pre-kernel jnp.pad) ---
# The engine picks ~512-row bands on small frames, so these shapes force
# every band/border combination: single unaligned band, multiple bands with
# h % band == 0 (static bottom fix), multiple bands with a mid-tile image
# end (masked dynamic fix; 700 has no multiple-of-8 divisor >= band/2).


@pytest.mark.parametrize("shape", [(1024, 256), (700, 130), (520, 257)])
def test_gaussian_pallas_band_borders(rng, shape):
    img = rng.random(shape, dtype=np.float32)
    out = np.asarray(gaussian(img, 4, 2.0, impl="pallas"))
    assert np.abs(out - gaussian_ref(img, 4, 2.0)).max() < 1e-5


@pytest.mark.parametrize("shape,radius", [((1024, 256), 9), ((700, 130), 15),
                                          ((10, 200), 15), ((600, 90), 3)])
def test_morph_pallas_band_borders(rng, shape, radius):
    # (10, 200) r15: image shorter than the SE — pure replicate both ways
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(erode(img, radius, impl="pallas")), erode_ref(img, radius))
    np.testing.assert_array_equal(
        np.asarray(dilate(img, radius, impl="pallas")),
        dilate_ref(img, radius))


@pytest.mark.parametrize("shape,radius", [((1024, 256), 8), ((700, 130), 5)])
def test_open_close_pallas_band_borders(rng, shape, radius):
    from tpuimg.kernels.sep_stencil import open_close_pallas
    from tpuimg.oracle import close_ref, open_ref

    img = rng.integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(open_close_pallas(img, radius, 0)), open_ref(img, radius))
    np.testing.assert_array_equal(
        np.asarray(open_close_pallas(img, radius, 1)), close_ref(img, radius))


@pytest.mark.parametrize("radius", [2, 7])
def test_sep_stencil_ypadded_matches_local(rng, radius):
    """The sharding entry point consumes real halo rows: feeding it the
    reflect/replicate-padded rows of a frame must reproduce the local op."""
    from tpuimg.kernels.sep_stencil import (gaussian_pallas_ypadded,
                                            morph_pallas_ypadded)

    img = rng.random((200, 300), dtype=np.float32)
    padded = np.pad(img, ((radius, radius), (0, 0)), mode="reflect")
    out = np.asarray(gaussian_pallas_ypadded(padded, radius, 1.5))
    assert np.abs(out - gaussian_ref(img, radius, 1.5)).max() < 1e-5

    u8 = rng.integers(0, 256, (200, 300), dtype=np.uint8)
    padded8 = np.pad(u8, ((radius, radius), (0, 0)), mode="edge")
    np.testing.assert_array_equal(
        np.asarray(morph_pallas_ypadded(padded8, radius, 0)),
        erode_ref(u8, radius))


@pytest.mark.parametrize("shape,radius", [((1024, 300), 6), ((700, 130), 6),
                                          ((1024, 300), 16)])
def test_guided_pallas_band_borders(rng, shape, radius):
    """Multi-band + unaligned-h coverage for the in-kernel border onepass.
    r=16 exercises halo depth 2r=32 == the halo block unit (a round-3 bug
    made the reflect fix read past a band <= 2r)."""
    from tpuimg.kernels.boxsum import guided_filter_pallas

    I = rng.random(shape, dtype=np.float32)
    p = np.clip(I + 0.1 * rng.standard_normal(shape), 0, 1).astype(np.float32)
    out = np.asarray(guided_filter_pallas(I, p, radius, 1e-3))
    ref = guided_filter_ref(I, p, radius, 1e-3, border="reflect101")
    assert np.abs(out - ref).max() < 1e-5


def test_guided_pallas_strips_real_halo(rng):
    """Interior strip edges must consume REAL halo columns, not reflect."""
    import tpuimg.kernels.boxsum as bx

    old = bx._MAX_STRIP, bx._MAX_STRIP_SELF
    bx._MAX_STRIP = bx._MAX_STRIP_SELF = 256
    try:
        I = rng.random((120, 700), dtype=np.float32)
        p = np.clip(I + 0.1 * rng.standard_normal(I.shape), 0,
                    1).astype(np.float32)
        out = np.asarray(bx.guided_filter_pallas(I, p, 4, 1e-3))
        ref = guided_filter_ref(I, p, 4, 1e-3, border="reflect101")
        assert np.abs(out - ref).max() < 1e-5
        outs = np.asarray(bx.guided_filter_pallas(I, I, 4, 1e-3,
                                                  self_guided=True))
        refs = guided_filter_ref(I, I, 4, 1e-3, border="reflect101")
        assert np.abs(outs - refs).max() < 1e-5
    finally:
        bx._MAX_STRIP, bx._MAX_STRIP_SELF = old


@pytest.mark.parametrize("self_guided", [False, True])
def test_guided_pallas_ypadded_matches_local(rng, self_guided):
    from tpuimg.kernels.boxsum import guided_pallas_ypadded

    r = 5
    I = rng.random((200, 260), dtype=np.float32)
    p = I if self_guided else np.clip(
        I + 0.1 * rng.standard_normal(I.shape), 0, 1).astype(np.float32)
    Ipad = np.pad(I, ((2 * r, 2 * r), (0, 0)), mode="reflect")
    ppad = Ipad if self_guided else np.pad(
        p, ((2 * r, 2 * r), (0, 0)), mode="reflect")
    out = np.asarray(guided_pallas_ypadded(Ipad, ppad, r, 1e-3,
                                           self_guided=self_guided))
    ref = guided_filter_ref(I, p, r, 1e-3, border="reflect101")
    assert np.abs(out - ref).max() < 1e-5


# --- round-4 CLAHE front/back-end fusion paths ---


def test_clahe_map_full_tiny_tile_fallback(rng):
    """th < 32/n_cand bound -> the per-y-run band path; same contract."""
    from tpuimg import clahe
    from tpuimg.oracle import clahe_ref

    img = rng.integers(0, 256, (64, 140), dtype=np.uint8)
    out = np.asarray(clahe(img, 30.0, 4, 8, impl="pallas"))  # th=8: fallback
    ref = clahe_ref(img, 30.0, 4, 8)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_clahe_out_f32_matches_u8(rng, impl):
    """_out_f32 emits the raw blend in [0, 255]: truncating it reproduces
    the u8 output bit-for-bit, for both mapping implementations."""
    from tpuimg import clahe

    img = rng.integers(0, 256, (100, 140), dtype=np.uint8)
    u8 = np.asarray(clahe(img, 30.0, 5, 3, impl=impl))
    f32 = np.asarray(clahe(img, 30.0, 5, 3, impl=impl, _out_f32=True))
    assert f32.dtype == np.float32
    requant = np.clip(np.trunc(f32), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(requant, u8)


def test_hist256_groups_packed_exact(rng):
    """The i32-packed grouped hist kernel counts bit-identically to the u8
    one (CLAHE regroup transposes in i32 on TPU)."""
    from tpuimg.kernels.hist import hist256_groups_pallas_packed
    from tpuimg.kernels.onehot import hist256_tiled
    import jax

    groups = rng.integers(0, 256, (6, 1024), dtype=np.uint8)
    packed = jax.lax.bitcast_convert_type(
        groups.reshape(6, 256, 4), np.int32)
    got = np.asarray(hist256_groups_pallas_packed(packed))
    np.testing.assert_array_equal(got, np.asarray(hist256_tiled(groups)))


@pytest.mark.parametrize("shape,grid", [((96, 160), (4, 4)),
                                        ((130, 390), (2, 3))])
def test_hist_tiles_fused_matches_transpose(rng, monkeypatch, shape, grid):
    """Force the TPU dispatch on CPU (interpret mode): the fused-regroup
    tile-hist kernel must count bit-identically to the transpose path,
    including misaligned th/tw with row and lane padding."""
    from tpuimg.ops import histogram as H

    yt, xt = grid
    th, tw = shape[0] // yt, shape[1] // xt
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = np.asarray(H._hist_tiles(jnp_asarray(img), yt, xt, th, tw))
    monkeypatch.setattr(H, "_on_tpu", lambda: True)
    got = np.asarray(H._hist_tiles(jnp_asarray(img), yt, xt, th, tw))
    np.testing.assert_array_equal(got, ref)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


@pytest.mark.parametrize("shape", [(96, 150), (200, 260)])
def test_enhance_tail_fused_matches_composed(rng, shape):
    """The fused gaussian+guided tail kernel == gaussian then guided_filter
    composed (reflect-101, 1/ksz^2), within float tolerance."""
    from tpuimg import gaussian, guided_filter
    from tpuimg.kernels.boxsum import enhance_tail_pallas

    f = rng.random(shape, dtype=np.float32)
    got = np.asarray(enhance_tail_pallas(f, 2, 1.5, 8, 1e-3))
    sm = gaussian(f, 2, 1.5)
    ref = np.asarray(guided_filter(f, np.asarray(sm), 8, 1e-3,
                                   border="reflect101"))
    assert np.abs(got - ref).max() < 1e-5


@pytest.mark.parametrize("shape,tiles", [((150, 200), 4), ((220, 260), 8)])
def test_enhance_tail_clahe_fused_matches_blend_then_tail(rng, shape, tiles):
    """The round-5 fully-fused enhance tail (CLAHE blend recomputed
    IN-KERNEL with mirrored reflect-101 coordinates) must match
    clahe_map_full's f32 blend fed through the f32 tail kernel to within a
    few ulps — i.e. blend(pad(img)) == pad(blend(img)) up to FMA
    contraction, including the frame borders where the halo coordinates
    fold back inside. (Bitwise equality is NOT attainable: the two
    separately-compiled kernels may contract the lerp's mul+add into an FMA
    differently — measured 1-ulp blend scatter on CPU interpret.)"""
    import jax.numpy as jnp

    from tpuimg.kernels.boxsum import (
        enhance_tail_clahe_pallas, enhance_tail_pallas)
    from tpuimg.kernels.lut import clahe_map_full
    from tpuimg.ops.histogram import _clahe_front, _map_bank, _tile_coord_runs

    h, w = shape
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    tables, th, tw, pad_top, pad_left = _clahe_front(
        jnp.asarray(img), 2.0, tiles, tiles)
    bank = _map_bank(tables, tiles, tiles)
    xinfo = tuple(
        (x0, x1, tx1) for x0, x1, tx1, _tx2, _ in
        _tile_coord_runs(w, tiles, tw, pad_left, use_recip=True))
    inv_tw = float(np.float32(1.0) / np.float32(tw))
    blend = clahe_map_full(
        jnp.asarray(img), bank, list(xinfo), pad_top=float(pad_top),
        th=float(th), ytiles=tiles, pad_left=float(pad_left), inv_tw=inv_tw,
        out_f32=True)
    f = blend * jnp.float32(1.0 / 255.0)
    ref = np.asarray(enhance_tail_pallas(f, 2, 1.5, 8, 1e-3))
    got = np.asarray(enhance_tail_clahe_pallas(
        img, bank, 2, 1.5, 8, 1e-3, pad_top=float(pad_top), th=th, tw=tw,
        ytiles=tiles, xtiles=tiles, pad_left=float(pad_left), inv_tw=inv_tw,
        xinfo=xinfo))
    # 1-ulp blend scatter (~3e-5 of 255) through the non-expanding tail
    assert np.abs(got - ref).max() < 5e-6
    # and the final u8 frames agree within 1 gray step
    to_u8 = lambda q: np.clip(np.rint(q * 255.0), 0, 255).astype(int)
    assert np.abs(to_u8(got) - to_u8(ref)).max() <= 1


def test_batched_he_pallas_per_frame_exact_b16(rng):
    """Batch-16 HE through the frames-grid Pallas LUT kernel: every frame
    must match its own single-frame result exactly (VERDICT r3 item 4)."""
    from tpuimg import hist_equalize
    from tpuimg.oracle import hist_equalize_ref

    imgs = rng.integers(0, 256, (16, 60, 90), dtype=np.uint8)
    out = np.asarray(hist_equalize(imgs, impl="pallas"))
    for i in range(16):
        np.testing.assert_array_equal(out[i], hist_equalize_ref(imgs[i]))
