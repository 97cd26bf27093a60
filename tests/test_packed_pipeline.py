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
    assert tiers[0][0] in (1, 2, 4, 8)
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
    # underflow flushes to zero, never negative/NaN
    y = np.asarray(_fast_exp(jnp.asarray([-200.0, -1000.0])))
    assert (y == 0).all()
