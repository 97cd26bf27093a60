"""Packed-instance fast path: expansion, packing, and kernel correctness.

The packed path replaces the gather/searchsorted machinery with
scatter+cumsum segment broadcast and a single-key payload sort; these
tests pin its equivalence to the straightforward XLA path and the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.oracle import psnr, render_oracle
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene


def _setup(n=2000, h=128, w=160, seed=0):
    scene = make_random_scene(n, seed=seed)
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(w / h)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    return scene, cam


def test_packed_matches_xla_compositor():
    scene, cam = _setup()
    cfg_x = RenderConfig(height=128, width=160, compositor="xla")
    cfg_p = RenderConfig(height=128, width=160, compositor="packed")
    assert cfg_p.packed_compatible
    fb_x, st_x = render_frame(scene, cam.params(3.0), cfg_x)
    fb_p, st_p = render_frame(scene, cam.params(3.0), cfg_p)
    # The packed path counts instances actually emitted: its exact-safe
    # ellipse prune may drop zero-contribution AABB tiles the xla path keeps.
    assert 0 < int(st_p.num_instances) <= int(st_x.num_instances)
    # Fixed-point feature quantization bounds the difference (~100 dB).
    assert psnr(np.asarray(fb_x), np.asarray(fb_p)) > 60.0


def test_packed_chunk_size_equivalence():
    """The packed kernel's chunk size is a pure scheduling knob: outputs
    must agree to float-association noise (the transmittance product is
    regrouped at chunk boundaries), never semantically. Guards the
    cfg.packed_chunk default bump 128 → 256 (profile_r3.jsonl)."""
    import dataclasses

    scene, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    fb_a, _ = render_frame(scene, cam.params(3.0), cfg)
    fb_b, _ = render_frame(
        scene, cam.params(3.0), dataclasses.replace(cfg, packed_chunk=128)
    )
    assert float(jnp.max(jnp.abs(fb_a - fb_b))) < 1e-5


def test_packed_term_stride_dma_depth_equivalence():
    """term_stride and dma_depth are pure scheduling knobs of the packed
    kernel: a strided (or disabled) early-termination check may run extra
    chunks whose weights the per-pixel gate zeroes, and deeper DMA
    buffering only changes prefetch distance — outputs must be
    BIT-identical to the default (term_stride=1, dma_depth=2) kernel."""
    import functools

    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
        composite_tiles_packed,
    )
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

    scene, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    pre = functools.partial(
        preprocess_gaussians, width=cfg.width, height=cfg.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y, sh_degree=cfg.sh_degree,
    )
    proj = jax.jit(pre)(scene.prepared(), cam.params(3.0))
    inst = build_packed_instances(
        proj, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=cfg.tile_w,
        tile_h=cfg.tile_h, near=0.2, far=100.0, tiers=cfg.tiers,
    )
    common = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=cfg.tile_w,
        tile_h=cfg.tile_h, width=cfg.width, height=cfg.height, chunk=64,
    )
    base = composite_tiles_packed(
        inst.packed_feats, inst.tile_start, inst.tile_count, **common
    )
    for term_stride, dma_depth in [(0, 2), (4, 2), (1, 3), (4, 4)]:
        out = composite_tiles_packed(
            inst.packed_feats, inst.tile_start, inst.tile_count,
            term_stride=term_stride, dma_depth=dma_depth, **common,
        )
        assert float(jnp.max(jnp.abs(out - base))) == 0.0, (
            term_stride, dma_depth,
        )


def test_packed_matches_oracle():
    scene, cam = _setup(seed=5)
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    fb, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    golden = render_oracle(scene, cam, cfg)
    assert psnr(np.asarray(golden), np.asarray(fb)) > 60.0


def test_segment_expansion_exact():
    """Interval-delta cumsum broadcast reproduces v[g] on every slot."""
    from gaussianrenderer_tpu.ops.tiling import _segment_expand_multi

    rng = np.random.default_rng(0)
    n, cap = 200, 1024
    counts = rng.integers(0, 6, n).astype(np.int32)
    incl = np.cumsum(counts).astype(np.int32)
    excl = (incl - counts).astype(np.int32)
    vals_f = rng.normal(size=n).astype(np.float32)
    bits = jax.lax.bitcast_convert_type(jnp.asarray(vals_f), jnp.uint32)
    vals_i = jnp.asarray(rng.integers(0, 2**31 - 1, n, dtype=np.int32))

    out_bits, out_i = _segment_expand_multi(
        jnp.asarray(excl), jnp.asarray(incl), [bits, vals_i], cap
    )
    out_f = np.asarray(jax.lax.bitcast_convert_type(out_bits, jnp.float32))
    out_i = np.asarray(out_i)

    total = int(incl[-1])
    expect_g = np.repeat(np.arange(n), counts)
    np.testing.assert_array_equal(out_f[:total], vals_f[expect_g])
    np.testing.assert_array_equal(out_i[:total], np.asarray(vals_i)[expect_g])


def test_packed_tier_overflow_flag_and_boost():
    # Many wide splats: the base tier capacities truncate (overflow flag),
    # a boosted config renders fully.
    scene = make_random_scene(2000, seed=5, scale_range=(0.05, 0.5))
    _, cam = _setup()
    cfg0 = RenderConfig(height=128, width=160, compositor="packed")
    fb0, st0 = render_frame(scene, cam.params(cfg0.k_sigma), cfg0)
    assert bool(st0.overflow)
    assert np.isfinite(np.asarray(fb0)).all()

    cfg2 = RenderConfig(
        height=128, width=160, compositor="packed", tier_boost=2
    )
    fb2, st2 = render_frame(scene, cam.params(cfg2.k_sigma), cfg2)
    assert not bool(st2.overflow)
    golden = render_oracle(scene, cam, cfg2)
    assert psnr(np.asarray(golden), np.asarray(fb2)) > 60.0


def test_auto_tier_renderer_converges():
    from gaussianrenderer_tpu.render import make_renderer

    scene = make_random_scene(2000, seed=5, scale_range=(0.05, 0.5))
    _, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    render = make_renderer(scene, cfg, auto_tier=True)
    fb, st = render(cam.params(cfg.k_sigma))
    assert not bool(st.overflow)


def test_packed_4d_time_slicing():
    scene = make_random_scene(1500, seed=2, spacetime=True)
    _, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    fb0, _ = render_frame(scene, cam.params(3.0), cfg, jnp.float32(0.0))
    fb1, _ = render_frame(scene, cam.params(3.0), cfg, jnp.float32(1.0))
    a, b = np.asarray(fb0), np.asarray(fb1)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.array_equal(a, b)  # time slicing changes the image


def test_windowed_ladder_matches_base_mode():
    """FULLY-WINDOWED emission (every tier k > 0 — payload rides the area
    sort, no all-N base broadcast) must emit exactly the same instance
    set as the equivalent base-mode ladder. Pixel values may differ only
    where stable-sort ties (same tile, same quantized depth) blend in a
    different order, so the comparison is PSNR + exact instance count."""
    import dataclasses

    scene = make_random_scene(3000, seed=11, scale_range=(0.02, 0.3))
    _, cam = _setup()
    base = RenderConfig(
        height=128, width=160, compositor="packed",
        tiers=((2, 0), (4, 2048), (6, 512), (12, 256), (20, 256)),
    )
    # Narrow windows sized for EFF classes: live-tile enumeration moves
    # splats with dead corner tiles DOWN the ladder (an area-4 splat with
    # one live tile is an eff-1 member), so eff-1/eff-2 populations
    # exceed the area-1/area-2 ones.
    windowed = dataclasses.replace(
        base,
        tiers=((1, 2048), (2, 2048), (4, 2048), (6, 512), (12, 256),
               (20, 256)),
    )
    fb_b, st_b = render_frame(scene, cam.params(3.0), base)
    fb_w, st_w = render_frame(scene, cam.params(3.0), windowed)
    assert not bool(st_b.overflow) and not bool(st_w.overflow)
    assert int(st_b.num_instances) == int(st_w.num_instances)
    assert psnr(np.asarray(fb_b), np.asarray(fb_w)) > 60.0
    golden = render_oracle(scene, cam, windowed)
    assert psnr(golden, np.asarray(fb_w)) > 60.0


def test_windowed_ladder_overflow_flagged():
    """A windowed narrow class bigger than its k must flag overflow (its
    surplus members are dropped, never emitted at a wrong width)."""
    scene = make_random_scene(3000, seed=11, scale_range=(0.02, 0.3))
    _, cam = _setup()
    cfg = RenderConfig(
        height=128, width=160, compositor="packed",
        # area-1 class at this scene is ~300 splats; k=64 starves it
        tiers=((1, 64), (4, 4096), (20, 512)),
    )
    _, st = render_frame(scene, cam.params(3.0), cfg)
    assert bool(st.overflow)


def test_4d_position_slicing_matches_oracle():
    """The position half of the spacetime north star: per-splat linear
    motion p(t) = p + v·(t − t_center) sliced before projection must
    match the oracle's mirror of the same math at a non-trivial time."""
    scene = make_random_scene(1200, seed=8, spacetime=True)
    assert scene.time_params.shape[1] == 5  # velocities present
    _, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    t = 0.7
    fb, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg, jnp.float32(t))
    golden = render_oracle(scene, cam, cfg, time_value=t)
    score = psnr(golden, np.asarray(fb))
    assert score > 60.0, f"4D motion PSNR {score:.2f} dB"


def test_4d_position_slicing_moves_splats():
    """Motion must be visible independently of temporal opacity: with a
    huge t_sigma (opacity window ≈ flat) and nonzero velocities, frames
    at t=0 and t=1 must differ. And at t = t_center with flat opacity the
    sliced render must equal the static (no-time) render exactly."""
    scene = make_random_scene(1000, seed=9, spacetime=True)
    tp = np.array(scene.time_params)  # writable copy
    tp[:, 0] = 0.4  # common t_center
    tp[:, 1] = 1e6  # flat temporal opacity
    scene = scene._replace(time_params=jnp.asarray(tp))
    _, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    fb0, _ = render_frame(scene, cam.params(3.0), cfg, jnp.float32(0.0))
    fb1, _ = render_frame(scene, cam.params(3.0), cfg, jnp.float32(1.0))
    assert not np.array_equal(np.asarray(fb0), np.asarray(fb1))
    # t == t_center, flat window -> identical to the static render
    fb_tc, _ = render_frame(scene, cam.params(3.0), cfg, jnp.float32(0.4))
    fb_st, _ = render_frame(scene, cam.params(3.0), cfg)
    np.testing.assert_allclose(
        np.asarray(fb_tc), np.asarray(fb_st), atol=2e-6
    )


def test_calibrate_tiers_shapes():
    import numpy as np

    from gaussianrenderer_tpu.render import calibrate_tiers

    from gaussianrenderer_tpu.ops.instances import AREA_BUCKETS

    nb = len(AREA_BUCKETS) + 1
    # mostly tiny splats: geometric-ish decay across the fine buckets
    hist = np.array(
        [900_000] + [max(80_000 >> i, 1) for i in range(nb - 2)] + [0]
    )
    tiers = calibrate_tiers(hist, num_tiles=2040)
    ms = [m for m, _ in tiers]
    assert ms == sorted(ms) and len(set(ms)) == len(ms)
    # First entry: a class/base tier (m in the small buckets) or the
    # COMPACTED-mode capacity head (m = 0 with a positive lane budget).
    assert tiers[0][0] in (0, 1, 2, 4, 8)
    if tiers[0][0] == 0:
        assert tiers[0][1] > 0 and all(k > 0 for _, k in tiers[1:])
    # every class above the base tier is covered by some wider tier
    assert ms[-1] >= 1024

    # wide-splat heavy histogram → wider base or big tiers, never invalid
    hist2 = np.array(
        [10, 20] + [min(100 << i, 1500) for i in range(nb - 3)] + [3]
    )
    tiers2 = calibrate_tiers(hist2, num_tiles=2040)
    ms2 = [m for m, _ in tiers2]
    assert ms2 == sorted(ms2)
    assert ms2[-1] >= 2040  # >1024-tile splats exist → whole-screen tier


def test_calibrated_tiers_render_correctly():
    import dataclasses

    scene = make_random_scene(3000, seed=11, scale_range=(0.02, 0.3))
    _, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    _, st = render_frame(scene, cam.params(3.0), cfg)
    from gaussianrenderer_tpu.render import calibrate_tiers

    tiers = calibrate_tiers(np.asarray(st.area_hist), num_tiles=cfg.num_tiles)
    cfg2 = dataclasses.replace(cfg, tiers=tiers)
    fb, st2 = render_frame(scene, cam.params(3.0), cfg2)
    assert not bool(st2.overflow)
    golden = render_oracle(scene, cam, cfg2)
    assert psnr(np.asarray(golden), np.asarray(fb)) > 60.0


def test_fast_exp_accuracy():
    """Kernel fast-exp ≤ 1e-5 relative error over the alpha-relevant range."""
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import _fast_exp

    x = jnp.linspace(-40.0, 0.0, 200_001)
    got = np.asarray(_fast_exp(x))
    want = np.exp(np.asarray(x, np.float64))
    rel = np.abs(got - want) / np.maximum(want, 1e-300)
    assert float(rel.max()) < 1e-5
    # underflow flushes to zero, never negative/NaN — including the
    # far-pixel md² extremes where (yi + 127) << 23 would overflow int32
    # without the input clamp (needle conic × 1000 px ⇒ q ~ 1e8).
    y = np.asarray(
        _fast_exp(jnp.asarray([-200.0, -1000.0, -1e8, -3.0e38]))
    )
    assert (y == 0).all()


def test_wide_overflow_does_not_emit_wrong_tier():
    """Overflow-regime window semantics (r2 code-review finding): when a
    WIDER class exceeds its k, its surplus members slide into narrower
    classes' clamped windows — the class-area mask must reject them there
    (emitting them at a narrower tier would silently truncate their
    rects), and the frame must raise overflow. The starved narrower class
    may emit nothing; auto_tier recalibration is the recovery path."""
    import numpy as np

    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.projection import ProjectedGaussians

    # 10 splats of tile area 16 (4x4 rects) + 4 splats of area 8 (4x2),
    # laid out on disjoint tiles; tiers provision only 4 slots per class.
    n = 14
    tile_w = tile_h = 32
    tmin_x = np.arange(n, dtype=np.int32) * 5
    tmin_y = np.zeros(n, dtype=np.int32)
    w = np.array([4] * 10 + [4] * 4, dtype=np.int32)
    h = np.array([4] * 10 + [2] * 4, dtype=np.int32)
    xmin = tmin_x * tile_w
    xmax = (tmin_x + w) * tile_w - 1
    ymin = tmin_y * tile_h
    ymax = (tmin_y + h) * tile_h - 1
    proj = ProjectedGaussians(
        valid=jnp.ones(n, bool),
        depth=jnp.linspace(1.0, 2.0, n),
        color=jnp.full((n, 3), 0.5),
        opacity=jnp.ones(n),
        center_px=jnp.stack(
            [(xmin + xmax) / 2.0, (ymin + ymax) / 2.0], axis=1
        ).astype(jnp.float32),
        # Tiny conic -> huge prune radius: the ellipse prune never masks.
        conic=jnp.full((n, 3), 1e-6) * jnp.array([1.0, 0.0, 1.0]),
        aabb_px=jnp.stack([xmin, ymin, xmax, ymax], 1).astype(jnp.float32),
        tile_min=jnp.stack([tmin_x, tmin_y], 1),
        tile_max=jnp.stack([tmin_x + w - 1, tmin_y + h - 1], 1),
    )
    inst = build_packed_instances(
        proj,
        tiles_x=128,
        tiles_y=8,
        tile_w=tile_w,
        tile_h=tile_h,
        tiers=((1, 0), (8, 4), (16, 4)),
    )
    assert bool(inst.overflow), "wider-class overflow must be flagged"
    # Only 4 of the 10 area-16 splats fit their class (4x16 = 64 lanes);
    # the area-8 class is starved (its members lie beyond k_sel) — but
    # CRUCIALLY no area-16 surplus may emit at the width-8 tier (that
    # would truncate their rects silently). Emitted == 64 exactly.
    assert int(inst.total_instances) == 64, int(inst.total_instances)


def test_no_jit_arity_workaround_fires():
    """Regression: jax 0.9's C++ jit fast path drops hoisted
    captured-constant parameters on re-dispatch ("Execution supplied N
    buffers but compiled program expected N+1"). Root cause was the
    module-level jnp SENTINEL array closed over by the trace
    (ops/instances.py); with it gone, the static→time→time sequence that
    deterministically reproduced the miscount must run without the
    render_frame workaround firing its RuntimeWarning."""
    import warnings

    scene_s = make_random_scene(800, seed=3)
    scene_t = make_random_scene(700, seed=4, spacetime=True)
    _, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        render_frame(scene_s, cam.params(3.0), cfg)
        render_frame(scene_t, cam.params(3.0), cfg, jnp.float32(0.0))
        render_frame(scene_t, cam.params(3.0), cfg, jnp.float32(1.0))


def test_area_histogram_matches_render_stats():
    """render.area_histogram (the CPU calibration probe's projection-only
    histogram) must agree exactly with the histogram the packed render
    path reports — both drive calibrate_tiers, and a drift between them
    would calibrate ladders for a different distribution than the one
    rendered."""
    from gaussianrenderer_tpu.render import area_histogram

    scene, cam = _setup(n=3000, seed=9)
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    _, stats = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    probe = area_histogram(scene, cam.params(cfg.k_sigma), cfg)
    np.testing.assert_array_equal(probe, np.asarray(stats.area_hist))


def test_conic_encoding_error_bounds():
    """v3 16-bit conic floats: e6m10 (A/C) must stay within 2^-11 relative
    error over the conic's dynamic range, s1e6m9 (B) within 2^-10 with
    sign preserved; kernel-side and emitter-side decodes must agree
    bit-for-bit (they are separate implementations of the same format)."""
    from gaussianrenderer_tpu.ops.instances import (
        _dec_e6m10,
        _dec_s1e6m9,
        _enc_e6m10,
        _enc_s1e6m9,
    )
    from gaussianrenderer_tpu.ops.pallas import tile_render2 as tr

    rng = np.random.default_rng(0)
    v = np.float32(10.0 ** rng.uniform(-9, 4, 50_000))
    enc = _enc_e6m10(jnp.asarray(v))
    dec = np.asarray(_dec_e6m10(enc))
    assert float(np.abs(dec - v).max() / v.min() >= 0)  # finite
    rel = np.abs(dec - v) / v
    assert float(rel.max()) <= 2.0**-11 + 1e-7, rel.max()
    np.testing.assert_array_equal(np.asarray(tr._dec_e6m10(enc)), dec)

    b = np.float32(
        np.sign(rng.normal(size=50_000)) * 10.0 ** rng.uniform(-9, 4, 50_000)
    )
    encb = _enc_s1e6m9(jnp.asarray(b))
    decb = np.asarray(_dec_s1e6m9(encb))
    relb = np.abs(decb - b) / np.abs(b)
    assert float(relb.max()) <= 2.0**-10 + 1e-7, relb.max()
    assert (np.sign(decb) == np.sign(b)).all()
    np.testing.assert_array_equal(np.asarray(tr._dec_s1e6m9(encb)), decb)

    # out-of-window clamps are graceful (no inf/nan), zero decodes tiny
    edges = np.asarray(
        _dec_e6m10(_enc_e6m10(jnp.asarray(np.float32([0.0, 1e-30, 2e5]))))
    )
    assert np.isfinite(edges).all()
    assert edges[0] < 1e-13 and edges[2] > 1e5


def test_conic_cholesky_quantization_psd_and_needles():
    """The packed conic rides as Cholesky factors (u, v, w) so that EVERY
    decoded conic is PSD. Direct 16-bit rounding of (A, B, C) puts the
    decoded det A·C − B²/4 NEGATIVE for anisotropic needle splats
    (md² indefinite → alpha explodes into opaque streaks); this pins
    (a) det ≥ 0 for the shipped encoding over a needle sweep where the
    naive encoding goes indefinite, and (b) worst-case alpha error
    ≤ 5e-3 at the evaluation points the blend test actually sees."""
    from gaussianrenderer_tpu.ops.instances import (
        _chol_conic,
        _conic_chol,
        _dec_e6m10,
        _dec_s1e6m9,
        _enc_e6m10,
        _enc_s1e6m9,
    )

    rng = np.random.default_rng(7)
    n = 20_000
    # Ellipses with eigenvalues sigma² ∈ [0.02, 200] px² and condition
    # numbers up to 10^4 (needles), arbitrary rotation.
    lam1 = np.float32(10.0 ** rng.uniform(-1.7, 2.3, n))
    kappa = np.float32(10.0 ** rng.uniform(0, 4, n))
    lam2 = lam1 / kappa
    th = np.float32(rng.uniform(0, np.pi, n))
    ct, st = np.cos(th), np.sin(th)
    # covariance = R diag(lam1, lam2) Rᵀ; conic = its inverse
    ia, ib2 = 1.0 / lam1, 1.0 / lam2
    A = ct * ct * ia + st * st * ib2
    C = st * st * ia + ct * ct * ib2
    B = 2.0 * ct * st * (ia - ib2)

    u, v, w = _conic_chol(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C))
    uq = _dec_e6m10(_enc_e6m10(u))
    vq = _dec_s1e6m9(_enc_s1e6m9(v))
    wq = _dec_e6m10(_enc_e6m10(w))
    Aq, Bq, Cq = (np.asarray(x) for x in _chol_conic(uq, vq, wq))

    det_q = Aq * Cq - 0.25 * Bq * Bq
    assert float(det_q.min()) >= 0.0, det_q.min()

    # The naive encoding must actually fail on this sweep — otherwise the
    # regression test is vacuous.
    An = np.asarray(_dec_e6m10(_enc_e6m10(jnp.asarray(A))))
    Bn = np.asarray(_dec_s1e6m9(_enc_s1e6m9(jnp.asarray(B))))
    Cn = np.asarray(_dec_e6m10(_enc_e6m10(jnp.asarray(C))))
    det_n = An * Cn - 0.25 * Bn * Bn
    assert float(det_n.min()) < 0.0

    # Worst-case alpha error at points along both principal axes at
    # md ∈ {0.5, 1, 2, 3} — where the blend test evaluates splats.
    ex, ey = ct, st
    fx, fy = -st, ct
    worst = 0.0
    for md in (0.5, 1.0, 2.0, 3.0):
        for dx, dy in (
            (ex * md * np.sqrt(lam1), ey * md * np.sqrt(lam1)),
            (fx * md * np.sqrt(lam2), fy * md * np.sqrt(lam2)),
        ):
            md2_t = A * dx * dx + B * dx * dy + C * dy * dy
            md2_q = Aq * dx * dx + Bq * dx * dy + Cq * dy * dy
            err = np.abs(
                np.exp(-0.5 * md2_q) - np.exp(-0.5 * md2_t)
            )
            worst = max(worst, float(err.max()))
    assert worst <= 5e-3, worst

def test_compacted_mode_matches_windowed_and_flags_capacity():
    """COMPACTED mode ((0, C) ladder head — ops/instances.py): each tier's
    member-major window placed at the running valid-lane offset must
    reproduce the plain fully-windowed ladder's framebuffer at a sort
    width of C instead of sum(m_c*k_c). Member-major emission reorders
    stable-sort TIES (same tile, same quantized depth) relative to the
    lane-major twin — toward the reference's per-gaussian order
    (render.cu:841-855) — so the scene's depths are made collision-free
    first and the comparison is then EXACT; a too-small C truncates and
    must FLAG overflow (truncation is never silent)."""
    import dataclasses

    from gaussianrenderer_tpu.render import area_histogram, calibrate_tiers

    scene, cam = _setup(n=8000, seed=11)
    # Unique quantized depths: spread z deterministically so no two
    # splats share a 21-bit depth bucket (kills tie-order ambiguity).
    z = jnp.linspace(-2.0, 2.0, scene.num_gaussians)
    scene = scene._replace(
        positions=scene.positions.at[:, 2].set(z)
    )
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    hist = area_histogram(scene, cam.params(cfg.k_sigma), cfg)
    tiers = calibrate_tiers(hist, num_tiles=cfg.num_tiles)

    if tiers[0][0] != 0:  # force the compacted twin if the model chose
        lanes = sum(m * k for m, k in tiers if m > 0)  # conservative C
        tiers = ((0, lanes),) + tuple((m, k) for m, k in tiers if k > 0)

    cfg_c = dataclasses.replace(cfg, tiers=tiers)
    fb_c, st_c = render_frame(scene, cam.params(cfg.k_sigma), cfg_c)
    assert not bool(st_c.overflow)

    cfg_w = dataclasses.replace(cfg, tiers=tiers[1:])
    fb_w, st_w = render_frame(scene, cam.params(cfg.k_sigma), cfg_w)
    assert int(st_c.num_instances) == int(st_w.num_instances)
    # The LANES are bit-identical (same instances, same order); the only
    # permitted drift is ULP-level: the shorter sort buffer shifts the
    # compositor's chunk alignment, regrouping the f32 blend accumulation.
    np.testing.assert_allclose(
        np.asarray(fb_c), np.asarray(fb_w), atol=1e-6, rtol=0
    )

    # Starved capacity: truncated coverage must raise the overflow flag.
    cfg_t = dataclasses.replace(
        cfg, tiers=((0, max(int(st_c.num_instances) // 4, 256)),) + tiers[1:]
    )
    _, st_t = render_frame(scene, cam.params(cfg.k_sigma), cfg_t)
    assert bool(st_t.overflow)


def test_area_key_depth_fold_ordering():
    """The windowed area sort folds quantized depth into the area key's
    low bits (one payload row saved at N scale). Unit-pins the fold's
    invariants: (a) primary order is area DESCENDING over valid splats
    with invalid (area 0) last — identical to the old (-area) key; (b)
    the low bits round-trip the exact depth; (c) for equal (area, depth)
    the stable sort preserves original order, so the frame sort's
    tie-break semantics are unchanged from the unfolded scheme."""
    rng = np.random.default_rng(4)
    n = 4096
    num_tiles = 2040
    tile_bits = max(int(num_tiles).bit_length(), 1)
    depth_bits = min(32 - tile_bits, 24)
    area = rng.integers(0, num_tiles + 1, n).astype(np.uint32)
    depth = rng.integers(0, 1 << depth_bits, n).astype(np.uint32)
    # force plenty of exact (area, depth) ties
    area[::7] = 5
    depth[::7] = 1234

    amax = np.uint32((1 << tile_bits) - 1)
    akey = ((amax - area) << depth_bits) | depth
    idx = jnp.asarray(np.arange(n, dtype=np.int32))
    s_key, s_idx = jax.lax.sort(
        (jnp.asarray(akey), idx), num_keys=1, is_stable=True
    )
    s_key, s_idx = np.asarray(s_key), np.asarray(s_idx)

    s_area = area[s_idx]
    s_depth_rt = s_key & np.uint32((1 << depth_bits) - 1)
    np.testing.assert_array_equal(s_depth_rt, depth[s_idx])  # (b)
    assert (np.diff(s_area.astype(np.int64)) <= 0).all()  # (a) area desc
    ties = (s_area[:-1] == s_area[1:]) & (
        depth[s_idx][:-1] == depth[s_idx][1:]
    )
    assert (s_idx[1:][ties] > s_idx[:-1][ties]).all()  # (c) stable


def test_compacted_capacity_survives_tier_merges():
    """calibrate_tiers sizes a COMPACTED ladder's (0, C) capacity from
    the per-class emission totals; merge_down then merges classes into
    WIDER tiers, raising what their members emit. C must grow with every
    merge (a TPU verify drive caught the pre-merge sizing: calibrated
    ladder, overflow=True) — pinned by checking C covers the exact
    post-merge emission total for the probed histogram."""
    from gaussianrenderer_tpu.ops.instances import AREA_BUCKETS
    from gaussianrenderer_tpu.render import calibrate_tiers

    nb = len(AREA_BUCKETS) + 1
    # Every bucket populated -> far more classes than max_tiers -> merges.
    hist = np.array([50_000 >> min(i, 14) for i in range(nb - 1)] + [0])
    hist = np.maximum(hist, 17)
    tiers = calibrate_tiers(hist, num_tiles=2040)
    if tiers[0][0] != 0:
        pytest.skip("cost model chose a non-compacted ladder here")
    cap = tiers[0][1]
    classes = [m for m, _ in tiers[1:]]
    need = 0
    for i, edge in enumerate(AREA_BUCKETS):
        count = int(hist[i])
        if count == 0:
            continue
        m_tier = next((m for m in classes if m >= edge), None)
        assert m_tier is not None, f"bucket {edge} uncovered by {classes}"
        need += m_tier * count
    assert cap >= need, (cap, need, tiers)


def test_packed_vpu_quadratic_matches_mxu():
    """mxu_q=False (direct VPU quadratic, kept as a measured alternative —
    see tile_render2._tile_kernel) must match the production MXU path to
    float-evaluation-order noise (profile_r3.jsonl measured 5e-4 max at
    the 1080p c4 shape; this small scene is tighter)."""
    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
        composite_tiles_packed,
    )
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

    scene, cam = _setup()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    camp = cam.params(3.0)
    proj = preprocess_gaussians(
        scene, camp, width=cfg.width, height=cfg.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        sh_degree=cfg.sh_degree, quantize_centers=cfg.quantize_centers,
    )
    inst = build_packed_instances(
        proj, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        capacity=cfg.instance_capacity(scene.num_gaussians),
        near=camp.near, far=camp.far,
    )
    kw = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        width=cfg.width, height=cfg.height, chunk=cfg.packed_chunk,
    )
    fb_mxu = composite_tiles_packed(
        inst.packed_feats, inst.tile_start, inst.tile_count, **kw
    )
    fb_vpu = composite_tiles_packed(
        inst.packed_feats, inst.tile_start, inst.tile_count,
        mxu_q=False, **kw
    )
    assert float(jnp.max(jnp.abs(fb_mxu - fb_vpu))) < 1e-3


def test_tile_dead_exact_vs_bruteforce():
    """The exact per-lane tile prune (_tile_dead) must be (a) SAFE: a tile
    it kills has NO integer pixel with alpha >= ALPHA_EPS under plain-f32
    math (the xla/diff/oracle semantics), and (b) EXACT up to its declared
    margin: a tile whose continuous min md2 exceeds gain_m must be killed
    (visible-face edge minima are the true rect minimum, not a bound)."""
    from gaussianrenderer_tpu.ops.instances import (
        ALPHA_EPS,
        _prune_params,
        _tile_dead,
    )

    rng = np.random.default_rng(0)
    n = 4000
    # Anisotropic conics up to needle condition 1e4, arbitrary rotation.
    lam1 = 10.0 ** rng.uniform(-4, 1, n)
    lam2 = lam1 * 10.0 ** rng.uniform(-4, 0, n)
    th = rng.uniform(0, np.pi, n)
    ct, st = np.cos(th), np.sin(th)
    a = lam1 * ct * ct + lam2 * st * st
    c = lam1 * st * st + lam2 * ct * ct
    b = 2.0 * (lam1 - lam2) * ct * st
    op = 10.0 ** rng.uniform(-2.9, 0, n)
    # Center anywhere around a 32x32 tile at origin; AABB a random box
    # around the center (clipped into screen-like range).
    cx = rng.uniform(-80, 112, n)
    cy = rng.uniform(-80, 112, n)
    ex = rng.uniform(1, 120, n)
    ey = rng.uniform(1, 120, n)
    xmin, xmax = cx - ex, cx + ex
    ymin, ymax = cy - ey, cy + ey

    prune = _prune_params(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(c, jnp.float32), jnp.asarray(op, jnp.float32),
    )
    dead = np.asarray(
        _tile_dead(
            prune,
            jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
            jnp.zeros(n, jnp.float32), jnp.zeros(n, jnp.float32),
            jnp.asarray(xmin, jnp.float32), jnp.asarray(ymin, jnp.float32),
            jnp.asarray(xmax, jnp.float32), jnp.asarray(ymax, jnp.float32),
            32, 32,
        )
    )

    # Brute force over the tile's integer pixels (f64 reference math).
    px = np.arange(32, dtype=np.float64)
    gx, gy = np.meshgrid(px, px, indexing="xy")
    gain = 2.0 * np.log(np.maximum(op, 1e-12) / ALPHA_EPS)
    killed_wrong = 0
    missed = 0
    for i in range(n):
        in_box = (
            (gx >= xmin[i]) & (gx <= xmax[i])
            & (gy >= ymin[i]) & (gy <= ymax[i])
        )
        dx = gx - cx[i]
        dy = gy - cy[i]
        md2 = a[i] * dx * dx + b[i] * dx * dy + c[i] * dy * dy
        alive_px = in_box & (md2 <= gain[i])
        if dead[i] and alive_px.any():
            killed_wrong += 1
        # Completeness: continuous min over the intersected rect, with a
        # wide margin beyond gain_m = gain*1.05 + 0.05 to absorb the f32
        # evaluation of the test itself.
        lx, hx = max(0.0, xmin[i]) - cx[i], min(31.0, xmax[i]) - cx[i]
        ly, hy = max(0.0, ymin[i]) - cy[i], min(31.0, ymax[i]) - cy[i]
        if hx < lx or hy < ly:
            if not dead[i]:
                missed += 1
            continue
        # exact rect min via dense continuous sampling of the boundary+interior
        ts = np.linspace(0, 1, 257)
        exs = np.concatenate([
            np.stack([np.full_like(ts, lx), ly + (hy - ly) * ts], 1),
            np.stack([np.full_like(ts, hx), ly + (hy - ly) * ts], 1),
            np.stack([lx + (hx - lx) * ts, np.full_like(ts, ly)], 1),
            np.stack([lx + (hx - lx) * ts, np.full_like(ts, hy)], 1),
        ])
        bmin = (
            a[i] * exs[:, 0] ** 2 + b[i] * exs[:, 0] * exs[:, 1]
            + c[i] * exs[:, 1] ** 2
        ).min()
        if lx <= 0 <= hx and ly <= 0 <= hy:
            bmin = 0.0
        if bmin > (gain[i] * 1.05 + 0.05) * 1.05 + 0.1 and not dead[i]:
            missed += 1
    assert killed_wrong == 0, f"{killed_wrong} tiles killed with live pixels"
    assert missed == 0, f"{missed} provably-dead tiles not killed"


def test_needle_scene_prune_is_invisible():
    """Diagonal-needle splats (condition up to ~2.5e4): the exact per-lane
    prune (_tile_dead) drops a large fraction of corner-tile instances the
    old isotropic radius kept — and the composited image must be identical
    to the prune-disabled build up to chunk-regrouping float noise (pruned
    lanes have alpha < 1e-3 at EVERY tile pixel, which the kernel zeroes
    anyway). Measured here: ~40% of instances drop, max image diff ~1e-7."""
    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
        composite_tiles_packed,
    )
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

    scene, cam = _setup(n=1500, seed=21)
    # Stretch scales into needles: one long axis, two tiny.
    s = np.asarray(scene.scales)
    s = np.stack([s[:, 0] * 8.0, s[:, 1] * 0.05, s[:, 2] * 0.05], 1)
    scene = scene._replace(scales=jnp.asarray(s, jnp.float32))
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    camp = cam.params(3.0)
    proj = preprocess_gaussians(
        scene, camp, width=cfg.width, height=cfg.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        sh_degree=cfg.sh_degree, quantize_centers=cfg.quantize_centers,
    )
    tiers = ((4, 0), (16, 1500), (64, 1500), (256, 512))
    kw = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        near=camp.near, far=camp.far, tiers=tiers,
    )
    inst_on = build_packed_instances(proj, **kw)
    inst_off = build_packed_instances(proj, _skip=("prune",), **kw)
    assert not bool(inst_on.overflow)
    n_on, n_off = int(inst_on.total_instances), int(inst_off.total_instances)
    assert n_on < 0.8 * n_off, (n_on, n_off)
    ckw = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        width=cfg.width, height=cfg.height, chunk=cfg.packed_chunk,
    )
    fb_on = composite_tiles_packed(
        inst_on.packed_feats, inst_on.tile_start, inst_on.tile_count, **ckw
    )
    fb_off = composite_tiles_packed(
        inst_off.packed_feats, inst_off.tile_start, inst_off.tile_count, **ckw
    )
    assert float(jnp.max(jnp.abs(fb_on - fb_off))) < 1e-5


def test_mask_slab_enumeration_exhaustive():
    """_emit_tier_mask_slabs must map lane j to the (j+1)-th set bit of
    the 8-bit live mask riding aabb_x's spare nibbles, decoded to rect
    position (p % w, p // w) — exhaustively over every rect shape with
    area <= ENUM_AREA and every mask subset (the divmod runs on integer
    compares; this pins it for all (p, w) pairs)."""
    from gaussianrenderer_tpu.ops.instances import (
        ENUM_AREA,
        SENTINEL,
        _emit_tier_mask_slabs,
    )

    shapes = [
        (w, h)
        for w in range(1, ENUM_AREA + 1)
        for h in range(1, ENUM_AREA + 1)
        if w * h <= ENUM_AREA
    ]
    rng = np.random.default_rng(5)
    members = []
    for w, h in shapes:
        for _ in range(12):
            area = w * h
            msk = int(rng.integers(0, 1 << area))
            members.append((w, h, msk))
    g = len(members)
    tiles_x, tile_w, tile_h, depth_bits = 16, 32, 32, 10
    tmin_x = rng.integers(0, 6, g).astype(np.int32)
    tmin_y = rng.integers(0, 6, g).astype(np.int32)
    rect_w = np.array([m[0] for m in members], np.int32)
    masks = np.array([m[2] for m in members], np.uint32)
    depth_q = rng.integers(0, 1 << depth_bits, g).astype(np.uint32)
    # aabb_x with the mask packed into the spare nibbles (bits 28-31 =
    # mask[0:4], 12-15 = mask[4:8]); aabb coords arbitrary 12-bit.
    xmin = rng.integers(0, 500, g).astype(np.uint32)
    xmax = xmin + rng.integers(0, 100, g).astype(np.uint32)
    ax = (xmin << 16) | xmax
    ax = ax | ((masks & 0xF) << 28) | ((masks >> 4) << 12)
    ay = (rng.integers(0, 500, g).astype(np.uint32) << 16) | rng.integers(
        500, 900, g
    ).astype(np.uint32)
    cq = rng.integers(0, 1 << 16, (2, g)).astype(np.uint32)
    rows6 = (
        (cq[0] << 16) | cq[1],
        rng.integers(0, 1 << 32, g, dtype=np.uint32),
        rng.integers(0, 1 << 32, g, dtype=np.uint32),
        rng.integers(0, 1 << 30, g, dtype=np.uint32),
        ax,
        ay,
    )
    m_out = ENUM_AREA
    keys, _rows = _emit_tier_mask_slabs(
        jnp.asarray(tmin_x), jnp.asarray(tmin_y), jnp.asarray(rect_w),
        jnp.ones(g, bool), jnp.asarray(depth_q),
        tuple(jnp.asarray(r) for r in rows6),
        m=m_out, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        depth_bits=depth_bits,
    )
    keys = np.asarray(keys).reshape(m_out, g)  # slab-major
    for i, (w, h, msk) in enumerate(members):
        live = [p for p in range(w * h) if msk >> p & 1]
        for j in range(m_out):
            if j < len(live):
                p = live[j]
                tx = tmin_x[i] + p % w
                ty = tmin_y[i] + p // w
                want = np.uint32((tx + ty * tiles_x) << depth_bits) | depth_q[i]
                assert keys[j, i] == want, (i, j, w, h, msk)
            else:
                assert keys[j, i] == SENTINEL, (i, j, w, h, msk)


def test_live_enumeration_windowed_needle_scene():
    """Windowed eff-classed emission on a diagonal-needle scene: the
    frame-sort lane count must shrink versus the rect-area classes the
    prune-off build uses (dead tiles no longer occupy lanes), the
    emitted instances must drop vs prune-off, and the composited image
    must match the prune-off build (pruned tiles have alpha < 1e-3 at
    every pixel)."""
    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
        composite_tiles_packed,
    )
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

    scene, cam = _setup(n=1500, seed=21)
    s = np.asarray(scene.scales)
    s = np.stack([s[:, 0] * 8.0, s[:, 1] * 0.05, s[:, 2] * 0.05], 1)
    scene = scene._replace(scales=jnp.asarray(s, jnp.float32))
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    camp = cam.params(3.0)
    proj = preprocess_gaussians(
        scene, camp, width=cfg.width, height=cfg.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        sh_degree=cfg.sh_degree, quantize_centers=cfg.quantize_centers,
    )
    tiers = ((1, 1500), (2, 1500), (4, 1500), (8, 1500), (16, 1500),
             (64, 1500), (256, 512))
    kw = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        near=camp.near, far=camp.far, tiers=tiers,
    )
    inst_on = build_packed_instances(proj, **kw)
    inst_off = build_packed_instances(proj, _skip=("prune",), **kw)
    assert not bool(inst_on.overflow)
    n_on, n_off = int(inst_on.total_instances), int(inst_off.total_instances)
    assert n_on < 0.85 * n_off, (n_on, n_off)
    # eff-classed windows move splats DOWN the ladder: the histogram the
    # calibrator sees puts strictly more splats in the narrow buckets.
    h_on = np.asarray(inst_on.area_hist)
    h_off = np.asarray(inst_off.area_hist)
    assert h_on[:3].sum() > h_off[:3].sum()
    ckw = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        width=cfg.width, height=cfg.height, chunk=cfg.packed_chunk,
    )
    fb_on = composite_tiles_packed(
        inst_on.packed_feats, inst_on.tile_start, inst_on.tile_count, **ckw
    )
    fb_off = composite_tiles_packed(
        inst_off.packed_feats, inst_off.tile_start, inst_off.tile_count, **ckw
    )
    assert float(jnp.max(jnp.abs(fb_on - fb_off))) < 1e-5


def test_base_mode_eff_ladder_no_truncation():
    """Review regression (round 3): class membership must key on the SAME
    eff metric in BOTH emission modes. The calibrator sizes ladders from
    the eff histogram; when base-mode membership keyed on rect AREA, a
    needle splat with area 12 / eff 2 needed an area-class window that
    was sized only for the eff-in-class count — truncating every frame
    with no recalibration escape. A base-mode ladder derived from the
    calibrated eff windows must render without overflow and emit exactly
    the windowed ladder's instance set."""
    import dataclasses

    scene, cam = _setup(n=3000, seed=21)
    s = np.asarray(scene.scales)
    s = np.stack([s[:, 0] * 8.0, s[:, 1] * 0.05, s[:, 2] * 0.05], 1)
    scene = scene._replace(scales=jnp.asarray(s, jnp.float32))
    cfg0 = RenderConfig(height=128, width=160, compositor="packed")
    from gaussianrenderer_tpu.render import area_histogram, calibrate_tiers

    hist = area_histogram(scene, cam.params(3.0), cfg0)
    tiers = calibrate_tiers(hist, num_tiles=cfg0.tiles_x * cfg0.tiles_y)
    if tiers[0][0] == 0:  # drop a compacted head for the windowed variant
        tiers = tiers[1:]
    base_tiers = ((2, 0),) + tuple((m, k) for m, k in tiers if m > 2)
    fb_b, st_b = render_frame(
        scene, cam.params(3.0), dataclasses.replace(cfg0, tiers=base_tiers)
    )
    fb_w, st_w = render_frame(
        scene, cam.params(3.0), dataclasses.replace(cfg0, tiers=tiers)
    )
    assert not bool(st_b.overflow), "base-mode eff ladder truncated"
    assert not bool(st_w.overflow)
    assert int(st_b.num_instances) == int(st_w.num_instances)
    assert psnr(np.asarray(fb_b), np.asarray(fb_w)) > 60.0


def test_edge_cases_all_culled_single_splat_portrait():
    """Degenerate inputs must render cleanly, not crash or NaN:
    (a) every splat behind the camera -> black frame, zero instances;
    (b) a single-splat scene -> matches the oracle;
    (c) portrait (tall) resolution -> live-tile enumeration still active
        (the mask rides aabb_x only; height does not gate it) and the
        packed image matches the xla compositor."""
    # (a) all culled: look away from the cloud
    scene, cam = _setup(n=500, seed=3)
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 12.0])  # cloud at origin is BEHIND
    cam.update_camera_matrices()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    fb, st = render_frame(scene, cam.params(3.0), cfg)
    assert int(st.num_instances) == 0
    assert not bool(st.overflow)
    assert float(jnp.max(jnp.abs(fb))) == 0.0

    # (b) single splat
    scene1, cam1 = _setup(n=1, seed=4)
    fb1, st1 = render_frame(scene1, cam1.params(3.0), cfg)
    assert np.isfinite(np.asarray(fb1)).all()
    golden = render_oracle(scene1, cam1, cfg)
    assert psnr(golden, np.asarray(fb1)) > 60.0

    # (c) portrait resolution
    scene2, cam2 = _setup(n=2000, h=256, w=128, seed=6)
    from gaussianrenderer_tpu.ops.instances import _enum_ok

    cfg_p = RenderConfig(height=256, width=128, compositor="packed")
    assert _enum_ok(cfg_p.tiles_x, cfg_p.tiles_y, cfg_p.tile_w, cfg_p.tile_h)
    fb_p, st_p = render_frame(scene2, cam2.params(3.0), cfg_p)
    cfg_x = RenderConfig(height=256, width=128, compositor="xla")
    fb_x, _ = render_frame(scene2, cam2.params(3.0), cfg_x)
    assert psnr(np.asarray(fb_x), np.asarray(fb_p)) > 60.0


def test_k_sigma_extremes_render_cleanly():
    """The UI slider's full range (0.1 - 8, canvas.cpp:311): k is traced,
    so both extremes run in one executable; tiny k shrinks coverage to
    (almost) nothing, k=8 must not overflow a calibrated ladder thanks to
    the alpha-threshold coverage bound (opacity-blind k-sigma boxes made
    high k a coverage cliff)."""
    from gaussianrenderer_tpu.render import make_renderer

    scene, cam = _setup(n=2000, seed=9)
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    render = make_renderer(scene, cfg, auto_tier=True)
    fb_hi, st_hi = render(cam.params(8.0))
    fb_lo, st_lo = render(cam.params(0.1))
    assert np.isfinite(np.asarray(fb_hi)).all()
    assert np.isfinite(np.asarray(fb_lo)).all()
    assert not bool(st_hi.overflow)
    assert int(st_lo.num_instances) < int(st_hi.num_instances)


def test_alpha_output_and_background_all_compositors():
    """cfg.output_alpha appends an accumulated-opacity row and
    cfg.background composites rgb + T_final*bg — identically across
    packed/xla/diff and matching the oracle's mirror of the same math
    (the packed kernel's ungated-T alpha differs from the frozen-T
    reference by <= the 1e-3 stop threshold itself)."""
    import dataclasses

    scene, cam = _setup(n=2000, seed=0)
    base = RenderConfig(
        height=128, width=160, background=(1.0, 1.0, 1.0), output_alpha=True
    )
    golden = render_oracle(scene, cam, base)
    assert golden.shape[0] == 4
    for comp in ("packed", "xla", "diff"):
        cfg = dataclasses.replace(base, compositor=comp)
        fb, _ = render_frame(scene, cam.params(3.0), cfg)
        assert fb.shape == (4, 128, 160), comp
        assert psnr(golden[:3], np.asarray(fb[:3])) > 60.0, comp
        assert psnr(golden[3], np.asarray(fb[3])) > 60.0, comp
        a = np.asarray(fb[3])
        assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6

    # bg-only keeps the reference's (3, H, W); empty corners are pure bg.
    cfg_bg = dataclasses.replace(base, compositor="packed", output_alpha=False)
    fb_bg, _ = render_frame(scene, cam.params(3.0), cfg_bg)
    assert fb_bg.shape == (3, 128, 160)
    assert float(fb_bg[0, 0, 0]) == 1.0
    # default output is bit-unchanged by the feature existing
    cfg0 = RenderConfig(height=128, width=160, compositor="packed")
    fb0, _ = render_frame(scene, cam.params(3.0), cfg0)
    assert fb0.shape == (3, 128, 160)
    assert float(fb0[0, 0, 0]) == 0.0


def test_depth_output_matches_oracle():
    """cfg.output_depth appends an expected-depth row (sum of w_i * d_i
    over the blend weights) after the alpha row. xla/diff accumulate the
    true f32 camera depth (exact vs the oracle mirror); the packed path
    reconstructs depth from the frame-sort key's 21+-bit quantization
    (rides the spare DMA row, costing the sort nothing) — within ~1e-3
    relative."""
    import dataclasses

    scene, cam = _setup(n=2000, seed=0)
    base = RenderConfig(
        height=128, width=160, output_alpha=True, output_depth=True
    )
    golden = render_oracle(scene, cam, base)
    assert golden.shape[0] == 5
    peak = float(golden[4].max())
    for comp in ("packed", "xla", "diff"):
        cfg = dataclasses.replace(base, compositor=comp)
        fb, _ = render_frame(scene, cam.params(3.0), cfg)
        assert fb.shape == (5, 128, 160), comp
        rel = float(np.abs(np.asarray(fb[4]) - golden[4]).max()) / peak
        assert rel < (2e-3 if comp == "packed" else 1e-5), (comp, rel)
    # depth-only: rows are [rgb, depth]
    cfg_d = RenderConfig(height=128, width=160, output_depth=True)
    fb_d, _ = render_frame(scene, cam.params(3.0), cfg_d)
    assert fb_d.shape == (4, 128, 160)
    g_d = render_oracle(scene, cam, cfg_d)
    assert float(np.abs(np.asarray(fb_d[3]) - g_d[3]).max()) / peak < 2e-3


def _giant_splat_scene(n_base=200, seed=1):
    """A normal scene plus giant splats whose projected centers land
    THOUSANDS of px off-screen (the real-trained-scene background-splat
    class: data/trained_100k.ply carries centers at ±14k px) — outside
    the fine 13.3 center carrier's [−2048, +6144) window."""
    from gaussianrenderer_tpu.scene.gaussians import GaussianScene

    base = make_random_scene(n_base, seed=seed)
    pos = np.asarray(base.positions)
    sh = np.asarray(base.sh)
    sc = np.asarray(base.scales)
    op = np.asarray(base.opacity)
    q = np.asarray(base.quats)
    gp = np.array(
        [[15.0, 0.0, 5.7], [0.0, -12.0, 5.6], [-18.0, 3.0, 5.75]],
        np.float32,
    )
    gs = np.full((3, 3), 6.0, np.float32)
    gq = np.tile(np.array([[1, 0, 0, 0]], np.float32), (3, 1))
    gop = np.full((3,), 0.4, np.float32)
    gsh = np.tile(sh[:1] * 0 + 0.5, (3, 1))
    return GaussianScene(
        positions=np.concatenate([pos, gp]),
        sh=np.concatenate([sh, gsh]),
        opacity=np.concatenate([op, gop]),
        scales=np.concatenate([sc, gs]),
        quats=np.concatenate([q, gq]),
    )


def test_coarse_center_giant_splats_match_oracle():
    """Giant off-carrier-center splats take the COARSE 1-px center
    encode (rgb bit 30) instead of clamping to the fine window — before
    this path, their whole footprint rendered with an arbitrarily wrong
    alpha field (flagged center_clipped, but wrong). The packed render
    must now track the f32 oracle and NOT flag."""
    scene = _giant_splat_scene()
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(1.0)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=128, width=128, compositor="packed",
                       tier_boost=2)

    # The scene really exercises the coarse window.
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

    p = preprocess_gaussians(
        scene, cam.params(cfg.k_sigma), width=128, height=128,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y, sh_degree=2,
    )
    c = np.asarray(p.center_px)
    v = np.asarray(p.valid)
    off = v & (
        (c[:, 0] < -2048) | (c[:, 0] > 6144)
        | (c[:, 1] < -2048) | (c[:, 1] > 6144)
    )
    assert off.sum() >= 2, "fixture must have off-carrier centers"

    fb, st = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert not bool(st.center_clipped)
    assert not bool(st.overflow)
    gold = render_oracle(scene, cam, cfg)
    assert psnr(np.asarray(fb), gold) > 60.0


def test_coarse_center_multichip_strips_agree():
    """The fine-window clamp used to land at a DIFFERENT global
    position per strip (y_off-shifted window), so every strip except
    strip 0 mis-rendered giant splats its own way — caught at 100k
    scale by tools/multichip_scale_probe.py. With the coarse encode the
    strips must agree with single-chip in every exchange mode."""
    from gaussianrenderer_tpu.parallel import (
        make_mesh,
        render_frame_multichip,
        shard_scene,
    )

    scene = _giant_splat_scene()
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(1.0)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=128, width=128, compositor="packed",
                       num_tile_x=4, num_tile_y=8, tier_boost=2)
    cp = cam.params(cfg.k_sigma)
    fb_single, st = render_frame(scene, cp, cfg)
    assert not bool(st.center_clipped)

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    for ex in ("gather32", "gather_q", "a2a_q"):
        fb, stats = render_frame_multichip(
            sharded, cp, cfg, mesh, exchange=ex
        )
        assert not bool(stats["center_clipped"]), ex
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fb_single), atol=2e-4,
            err_msg=ex,
        )


def test_emission_clamped_head_and_auto_chunk():
    """calibrate_tiers(emission_max=...) clamps the compacted head to
    the OBSERVED worst-pose emission (the histogram's Σ m·count sums
    per-class maxima and oversizes it ~2× — measured 943k modeled vs
    468k actual on the 100k trained scene), and make_renderer's
    calibration applies the measured packed-chunk rule. Render equality
    and the overflow flag pin that the clamp is safe."""
    from gaussianrenderer_tpu.render import (
        area_histogram,
        calibrate_tiers,
        emission_total,
        make_renderer,
    )

    scene = make_random_scene(3000, seed=6)
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(1.0)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=128, width=128, compositor="packed")
    cp = cam.params(cfg.k_sigma)

    hist = area_histogram(scene, cp, cfg)
    emax = emission_total(scene, cp, cfg)
    assert emax > 0
    loose = calibrate_tiers(hist, num_tiles=cfg.num_tiles)
    tight = calibrate_tiers(
        hist, num_tiles=cfg.num_tiles, emission_max=emax
    )
    exact = calibrate_tiers(
        hist, num_tiles=cfg.num_tiles, pose_hists=[hist]
    )
    if loose and int(loose[0][0]) == 0:  # compacted candidate won
        assert int(tight[0][1]) <= int(loose[0][1])
        assert int(tight[0][1]) >= emax  # margin keeps coverage
        # The exact per-pose Σ m·count bound also covers the emission.
        assert int(exact[0][1]) >= emax
        assert int(exact[0][1]) <= int(loose[0][1])

    # Session path: auto_tier applies the clamp + the chunk rule; the
    # frame must not overflow and emission_total must equal the render's
    # own num_instances (same prepack).
    render = make_renderer(scene, cfg, auto_tier=True)
    fb, stats = render(cp)
    assert not bool(stats.overflow)
    assert int(stats.num_instances) == emax
    from gaussianrenderer_tpu.render import ladder_lanes

    live = render.current_cfg()
    lanes = (
        int(live.tiers[0][1])
        if live.tiers and int(live.tiers[0][0]) == 0
        else ladder_lanes(live.tiers, scene.num_gaussians)
    )
    assert live.packed_chunk == RenderConfig.auto_packed_chunk(lanes)
