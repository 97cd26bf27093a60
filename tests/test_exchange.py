"""Multi-chip record-exchange data plane (VERDICT r3 #1).

The packed multichip path exchanges QUANTIZED 28 B/splat records
(``ops.instances.encode_record_rows``) instead of the legacy 22-f32
(88 B) record — either as an all_gather ("gather_q") or as the
strip-OWNERSHIP all_to_all ("a2a_q", SURVEY §2.11's mapping) whose wire
bytes and post-exchange compute are ~N/D per chip. These tests pin:

* encode→decode idempotency against the packed pipeline's own quantizers
  (the decoded record re-encodes to the same bits);
* image equality vs the single-chip packed render for every exchange
  mode, including wide splats spanning ≥3 strips (the all_gather "wide
  window" path), straddlers (the 2-destination slab), balanced unequal
  strips, and calibrated window capacities;
* overflow flagging when the static exchange windows truncate (never
  silent — project rule).
"""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.parallel import (
    a2a_caps_for_scene,
    default_a2a_caps,
    make_mesh,
    render_frame_multichip,
    shard_scene,
)
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene


def _setup(n=500, h=128, w=128, **scene_kw):
    scene = make_random_scene(n, seed=3, **scene_kw)
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(60.0)
    cam.set_aspect_ratio(w / h)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(
        height=h, width=w, compositor="packed", num_tile_x=4, num_tile_y=8
    )
    return scene, cam, cfg


def _project(scene, cam, cfg):
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

    return preprocess_gaussians(
        scene,
        cam.params(cfg.k_sigma),
        width=cfg.width,
        height=cfg.height,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y,
        sh_degree=cfg.sh_degree,
    )


def test_record_roundtrip_is_idempotent():
    """decode(encode(proj)) must re-encode to the SAME bits: every field
    decodes to exactly the value the packed pipeline's own quantizers
    reproduce (conic excepted — its re-Cholesky can move w by ~1 ulp of
    the f32 v²+w² sum, bounded here at 2⁻²⁰ relative)."""
    from gaussianrenderer_tpu.ops.instances import (
        decode_record_rows,
        encode_record_rows,
    )

    scene, cam, cfg = _setup(n=400)
    proj = _project(scene, cam, cfg)
    rows = encode_record_rows(proj)
    assert rows.shape == (7, 400) and rows.dtype == jnp.uint32
    dec, sat = decode_record_rows(
        rows, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
    )
    rows2 = encode_record_rows(dec)
    v = np.asarray(proj.valid)
    r1, r2 = np.asarray(rows), np.asarray(rows2)
    # Bit-identical re-encode on every row except the conic row pair
    # (1: u|w, 2: v|op — op half must still match exactly).
    np.testing.assert_array_equal(r1[0][v], r2[0][v])  # center
    np.testing.assert_array_equal(r1[3][v] & 0x7FFFFFFF,
                                  r2[3][v] & 0x7FFFFFFF)  # rgb+valid
    np.testing.assert_array_equal(r1[4][v], r2[4][v])  # aabb x
    np.testing.assert_array_equal(r1[5][v], r2[5][v])  # aabb y
    np.testing.assert_array_equal(r1[6][v], r2[6][v])  # depth bits
    np.testing.assert_array_equal(r1[2][v] & 0xFFFF, r2[2][v] & 0xFFFF)
    # Conic: decoded (A,B,C) within the recorded quantization budget and
    # PSD; re-encoded within 1 code point.
    c = np.asarray(dec.conic)[v]
    assert np.all(c[:, 0] * c[:, 2] - 0.25 * c[:, 1] ** 2 >= -1e-6)
    for row in (1, 2):
        hi1, hi2 = r1[row][v] >> 16, r2[row][v] >> 16
        lo1, lo2 = r1[row][v] & 0xFFFF, r2[row][v] & 0xFFFF
        assert np.max(np.abs(hi1.astype(np.int64) - hi2.astype(np.int64))) <= 1
        assert np.max(np.abs(lo1.astype(np.int64) - lo2.astype(np.int64))) <= 1
    # Tile rects re-derive exactly (projection.py's stride division).
    np.testing.assert_array_equal(
        np.asarray(dec.tile_min)[v], np.asarray(proj.tile_min)[v]
    )
    np.testing.assert_array_equal(
        np.asarray(dec.tile_max)[v], np.asarray(proj.tile_max)[v]
    )
    np.testing.assert_array_equal(np.asarray(dec.valid), v)
    assert not np.any(np.asarray(sat)[v]), "no saturation on this scene"
    # Depth rides exactly (drives the frame-sort key).
    np.testing.assert_array_equal(
        np.asarray(dec.depth)[v], np.asarray(proj.depth)[v]
    )


def test_quantized_gather_matches_single_device():
    scene, cam, cfg = _setup()
    fb_single, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh, exchange="gather_q"
    )
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fb_single), atol=2e-4
    )


def test_a2a_exchange_matches_single_device():
    """Ownership all_to_all: default caps, straddlers included."""
    scene, cam, cfg = _setup()
    fb_single, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh, exchange="a2a_q"
    )
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fb_single), atol=2e-4
    )


def test_a2a_wide_splats_ride_the_gather_window():
    """Splats spanning ≥3 strips can't ride the 2-destination slabs —
    they take the small all_gather window. Big scales force many; the
    composed image must still match single-chip (non-overflowing ladder
    via tier_boost so truncation regimes don't differ)."""
    scene, cam, cfg = _setup(n=501, scale_range=(0.05, 0.8))
    cfg = RenderConfig(**{**cfg.__dict__, "tier_boost": 3})
    fb_single, st = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    assert not bool(st.overflow)
    # The scene really does exercise the wide path.
    proj = _project(scene, cam, cfg)
    rows_spanned = (
        np.asarray(proj.tile_max)[:, 1] - np.asarray(proj.tile_min)[:, 1] + 1
    )
    # tiles_y == 8 strips, 1 row each: spanning >2 rows = >2 strips.
    assert np.any(np.asarray(proj.valid) & (rows_spanned > 2))

    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    fb, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh, exchange="a2a_q"
    )
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fb_single), atol=2e-4
    )


def test_a2a_balanced_strips_and_calibrated_caps():
    scene, cam, cfg = _setup(n=501, scale_range=(0.05, 0.8))
    cfg = RenderConfig(**{**cfg.__dict__, "tier_boost": 3})
    cp = cam.params(cfg.k_sigma)
    fb_single, _ = render_frame(scene, cp, cfg)
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    bounds = (0, 2, 3, 4, 5, 6, 7, 7, 8)  # unequal, one empty strip
    fb, stats = render_frame_multichip(
        sharded, cp, cfg, mesh, strip_bounds=bounds, exchange="a2a_q"
    )
    assert not bool(stats["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb), np.asarray(fb_single), atol=2e-4
    )

    caps = a2a_caps_for_scene(scene, cp, cfg, 8)
    assert caps[0] >= 1 and caps[1] >= 1
    fb2, stats2 = render_frame_multichip(
        sharded, cp, cfg, mesh, exchange="a2a_q", a2a_caps=caps
    )
    assert not bool(stats2["overflow"])
    np.testing.assert_allclose(
        np.asarray(fb2), np.asarray(fb_single), atol=2e-4
    )


def test_a2a_window_truncation_flags_overflow():
    scene, cam, cfg = _setup()
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    _, stats = render_frame_multichip(
        sharded, cam.params(cfg.k_sigma), cfg, mesh,
        exchange="a2a_q", a2a_caps=(2, 2),
    )
    assert bool(stats["overflow"])


def test_default_caps_and_bad_mode():
    import pytest

    cap, wide, straddle = default_a2a_caps(3_000_000, 16)
    ns = -(-3_000_000 // 16)
    assert cap >= 3 * ns // 16 and wide >= ns // 64 and straddle >= 64

    scene, cam, cfg = _setup()
    mesh = make_mesh()
    sharded = shard_scene(scene, mesh)
    with pytest.raises(ValueError, match="exchange"):
        render_frame_multichip(
            sharded, cam.params(cfg.k_sigma), cfg, mesh, exchange="bogus"
        )
