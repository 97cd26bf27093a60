"""Multi-chip shard_map render on the virtual 8-device CPU mesh.

Validates that the gaussian-sharded / tile-strip-parallel path produces the
same image as the single-device renderer.
"""

import numpy as np
import jax

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.parallel import make_mesh, render_frame_multichip, shard_scene
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene


def _setup(n=500, h=128, w=128):
    scene = make_random_scene(n, seed=3)
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(w / h)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    # Explicit 4x8 tile grid so tiles_y divides the 8-device mesh.
    cfg = RenderConfig(
        height=h, width=w, compositor="xla", num_tile_x=4, num_tile_y=8
    )
    return scene, cam, cfg


def test_multichip_matches_single_device():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    scene, cam, cfg = _setup()
    assert cfg.tiles_y % 8 == 0

    fb_single, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb_multi, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh
    )

    assert fb_multi.shape == (3, cfg.height, cfg.width)
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=2e-5
    )


def test_multichip_packed_path_matches_single_device():
    """The strip renderer must run the gather-free packed fast path too
    (VERDICT r1: the sharded path may not silently stay on the legacy
    gather pipeline) and agree with the single-chip packed render."""
    scene, cam, cfg = _setup()
    cfg = RenderConfig(**{**cfg.__dict__, "compositor": "packed"})
    assert cfg.packed_compatible

    fb_single, sstats = render_frame(scene, cam.params(cfg.k_sigma), cfg)

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb_multi, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh
    )
    assert not bool(stats["overflow"])
    assert not bool(stats["center_clipped"])
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=2e-4
    )


def test_multichip_overflow_is_reported():
    scene, cam, cfg = _setup()
    cfg = RenderConfig(
        **{
            **cfg.__dict__,
            "compositor": "xla",
            "instance_multiplier": 0.01,
            "min_instance_capacity": 16,
        }
    )
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    _, stats = render_frame_multichip(sharded, cam.params(cfg.k_sigma), cfg, mesh)
    assert bool(stats["overflow"])


def test_multichip_scene_padding():
    # N not divisible by 8 — shard_scene pads with transparent splats.
    scene, cam, cfg = _setup(n=501)
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    assert sharded.num_gaussians % 8 == 0
    fb_single, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb_multi, _ = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh
    )
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=2e-5
    )


def test_multichip_compacted_ladder_strips_divide_capacity():
    """COMPACTED ladders ((0, C) head): under shard_map each strip sorts
    only its scaled capacity share (3C/S margin over the measured strip
    slack — parallel/multichip.py), and the composed frame still matches
    the single-chip compacted render."""
    scene, cam, cfg = _setup()
    wtiers = ((1, 2048), (4, 4096), (16, 2048), (64, 1024), (256, 256))
    cap = sum(m * k for m, k in wtiers)  # conservative: never truncates
    cfg = RenderConfig(
        **{
            **cfg.__dict__,
            "compositor": "packed",
            "tiers": ((0, cap),) + wtiers,
        }
    )
    assert cfg.packed_compatible

    fb_single, st = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert not bool(st.overflow)

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb_multi, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh
    )
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=2e-4
    )


def test_row_loads_from_rects_matches_naive():
    """The O(N + tiles_y) difference-array form must equal the per-row
    masked reduction it replaced, including out-of-range rects."""
    from gaussianrenderer_tpu.parallel import row_loads_from_rects

    rng = np.random.default_rng(7)
    n, tiles_y = 300, 16
    tmin_y = rng.integers(-3, tiles_y + 3, n)
    tmax_y = tmin_y + rng.integers(0, 6, n)
    rect_w = rng.integers(1, 9, n).astype(np.int64)
    valid = rng.random(n) < 0.8
    got = row_loads_from_rects(tmin_y, tmax_y, rect_w, valid, tiles_y)
    want = np.zeros(tiles_y, np.int64)
    for r in range(tiles_y):
        inter = valid & (tmin_y <= r) & (tmax_y >= r)
        want[r] = int(np.sum(rect_w[inter]))
    np.testing.assert_array_equal(got, want)


def test_balance_strip_bounds_partitioner():
    from gaussianrenderer_tpu.parallel import balance_strip_bounds

    # Horizon-heavy loads: optimal contiguous 4-way split.
    loads = [10, 1, 1, 1, 1, 1, 1, 10]
    b = balance_strip_bounds(loads, 4)
    assert b[0] == 0 and b[-1] == 8 and len(b) == 5
    sums = [sum(loads[b[i]:b[i + 1]]) for i in range(4)]
    assert max(sums) <= 11  # optimal max is 11 (10+1)
    # Fewer heavy rows than strips: trailing strips may be empty.
    b2 = balance_strip_bounds([100, 1], 4)
    assert b2[0] == 0 and b2[-1] == 2 and len(b2) == 5
    # Uniform loads reduce to the equal-row split.
    b3 = balance_strip_bounds([5] * 8, 4)
    assert b3 == (0, 2, 4, 6, 8)


def test_balanced_strips_match_single_device():
    """Load-balanced (unequal, one empty) strip boundaries must render the
    same image as the single-chip path — the Pallas strip runs rows_max
    rows but owns only its boundary range."""
    scene, cam, cfg = _setup()
    cfg = RenderConfig(**{**cfg.__dict__, "compositor": "packed"})
    fb_single, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    # 8 rows over 8 chips, deliberately skewed: chip0 gets 2 rows,
    # chip6 gets 0, the rest 1.
    bounds = (0, 2, 3, 4, 5, 6, 7, 7, 8)
    fb_multi, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh, strip_bounds=bounds
    )
    assert fb_multi.shape == (3, cfg.height, cfg.width)
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=2e-5
    )


def test_balanced_strips_windowed_ladder_keeps_straddlers():
    """Windowed/compacted ladders re-derive tile rects from the packed
    pixel AABB; with UNEQUAL strip bounds (rows_here < rows_max) a splat
    straddling a strip's last owned row used to re-derive a larger area
    than the row-clamped rect it was classed by, and the class-area
    defense mask dropped it silently (no overflow) from rows the chip
    owns. The strip-local AABB clamp in _strip_render pins the fix."""
    scene, cam, cfg = _setup()
    wtiers = ((1, 2048), (4, 4096), (16, 2048), (64, 1024), (256, 256))
    cap = sum(m * k for m, k in wtiers)
    cfg = RenderConfig(
        **{
            **cfg.__dict__,
            "compositor": "packed",
            "tiers": ((0, cap),) + wtiers,
        }
    )
    fb_single, st = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert not bool(st.overflow)

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    bounds = (0, 2, 3, 4, 5, 6, 7, 7, 8)  # rows_max=2, most chips own 1
    fb_multi, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh, strip_bounds=bounds
    )
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=2e-4
    )


def test_balanced_strips_validates_bounds():
    import pytest

    scene, cam, cfg = _setup()
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    with pytest.raises(ValueError, match="strip_bounds"):
        render_frame_multichip(
            sharded, cam.params(cfg.k_sigma), cfg, mesh,
            strip_bounds=(0, 3, 8),  # wrong arity for 8 chips
        )


def test_balance_strips_for_scene_end_to_end():
    """One-call calibration: probe a pose, partition, render with the
    bounds — image equality and measurable balance improvement."""
    from gaussianrenderer_tpu.parallel import (
        balance_strips_for_scene,
        strip_row_loads,
    )

    scene, cam, cfg = _setup()
    cam_p = cam.params(cfg.k_sigma)
    loads = strip_row_loads(scene, cam_p, cfg)
    assert loads.shape == (cfg.tiles_y,) and loads.sum() > 0
    bounds = balance_strips_for_scene(scene, cam_p, cfg, 8)
    assert len(bounds) == 9 and bounds[0] == 0 and bounds[-1] == cfg.tiles_y

    fb_single, _ = render_frame(scene, cam_p, cfg)
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb_multi, stats = render_frame_multichip(
        sharded, cam_p, cfg, mesh, strip_bounds=bounds
    )
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=2e-5
    )
    # The balanced max strip load never exceeds the equal-split max.
    diffs = [bounds[i + 1] - bounds[i] for i in range(8)]
    bal = [int(loads[bounds[i]:bounds[i + 1]].sum()) for i in range(8)]
    eq = [int(loads[i:i + 1].sum()) for i in range(8)]  # 8 rows, 1 each
    assert max(bal) <= max(eq)


def test_multichip_background_and_alpha_match_single_device():
    """cfg.background / cfg.output_alpha apply per strip (both are
    per-pixel), so the multichip frame must equal the single-chip one
    including the composited background and the alpha row."""
    import dataclasses

    scene, cam, cfg0 = _setup()
    cfg = dataclasses.replace(
        cfg0, background=(1.0, 1.0, 1.0), output_alpha=True
    )
    fb_single, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert fb_single.shape[0] == 4

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb_multi, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh
    )
    assert fb_multi.shape == fb_single.shape
    np.testing.assert_allclose(
        np.asarray(fb_multi), np.asarray(fb_single), atol=1e-5
    )
    assert not bool(stats["overflow"])


def test_rect_strips_match_single_device():
    """2-D rect strips (row bands × column ranges — VERDICT r4 #3) must
    render the single-chip image exactly, including uneven rects and the
    x-rebase, on BOTH quantized exchanges."""
    scene, cam, cfg = _setup()
    cfg = RenderConfig(**{**cfg.__dict__, "compositor": "packed"})
    fb_single, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    # 8 chips as 4 bands × 2 cols with uneven rows AND columns
    # (grid is 4 tiles wide × 8 tall).
    rects = ((0, 3, 5, 7, 8), ((0, 1, 4), (0, 2, 4), (0, 3, 4), (0, 2, 4)))
    for exchange in ("gather32", "gather_q", "a2a_q"):
        fb_multi, stats = render_frame_multichip(
            sharded, cam.params(cfg.k_sigma), cfg, mesh,
            strip_rects=rects, exchange=exchange,
        )
        assert fb_multi.shape == (3, cfg.height, cfg.width)
        assert not bool(stats["overflow"]), exchange
        np.testing.assert_allclose(
            np.asarray(fb_multi), np.asarray(fb_single), atol=2e-5,
            err_msg=exchange,
        )


def test_balance_strip_rects_partitions_and_beats_rows_on_pose():
    """The rect partitioner covers the grid exactly, orders chips
    band-major, and its calibration-pose slack is <= the row-only
    partition's (it includes (D, 1) as a candidate)."""
    from gaussianrenderer_tpu.parallel.multichip import (
        balance_strip_bounds,
        balance_strip_rects,
        rect_geometry,
    )

    rng = np.random.default_rng(7)
    loads = (rng.pareto(1.5, size=(34, 60)) * 100).astype(np.int64)
    for d in (8, 16):
        spec, slack = balance_strip_rects(loads, d)
        rects, rows_max, cols_max = rect_geometry(spec, d, 34, 60)
        cover = np.zeros((34, 60), np.int32)
        for (y0, rh, x0, cw) in rects:
            cover[y0 : y0 + rh, x0 : x0 + cw] += 1
        assert np.all(cover == 1), "rects must tile the grid exactly"
        rb = balance_strip_bounds(loads.sum(axis=1), d)
        ideal = loads.sum() / d
        row_slack = max(
            loads[rb[i] : rb[i + 1]].sum() for i in range(d)
        ) / ideal
        assert slack <= row_slack + 1e-9
