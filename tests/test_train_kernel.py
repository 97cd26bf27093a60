"""The Pallas train compositor (ops/pallas/tile_train.py): forward parity
with the scan compositor and hand-written-VJP equivalence with jax.grad.

The sort-oracle testing pattern of SURVEY §4 applied to autodiff: XLA's
reverse-mode through ``composite_tiles_diff`` is the ground truth the
custom backward must reproduce (the analog of OneSweep vs CUB)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.ops.compositing import (
    build_features,
    composite_tiles_diff,
    gather_sorted_features,
)
from gaussianrenderer_tpu.ops.pallas.tile_train import (
    composite_tiles_train,
    train_kernel_compatible,
)
from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
from gaussianrenderer_tpu.ops.tiling import build_sorted_instances
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.io import make_random_scene


def _pipeline(scene, cam, cfg):
    pre = functools.partial(
        preprocess_gaussians, width=cfg.width, height=cfg.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y, sh_degree=cfg.sh_degree,
        quantize_centers=False,
    )
    proj = jax.jit(pre)(scene.prepared(), cam.params(3.0))
    asg = build_sorted_instances(
        proj, tiles_x=cfg.tiles_x, num_tiles=cfg.num_tiles,
        capacity=cfg.instance_capacity(scene.num_gaussians),
        depth_scale=cfg.depth_scale, near=0.2, far=100.0,
    )
    sf = gather_sorted_features(build_features(proj), asg, cfg.chunk_size)
    return sf, asg


def _camera(aspect, pos=(0.0, 0.0, 5.0), fov=60.0):
    cam = Camera()
    cam.set_position(list(pos))
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(fov)
    cam.set_aspect_ratio(aspect)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    return cam


def _losses(sf, asg, cfg, gw):
    common = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=cfg.tile_w,
        tile_h=cfg.tile_h, width=cfg.width, height=cfg.height,
    )

    def loss_diff(sf):
        fb = composite_tiles_diff(
            sf, asg.tile_start, asg.tile_count, chunk_size=cfg.chunk_size,
            max_chunks=cfg.diff_max_chunks, return_alpha=True, **common,
        )
        return jnp.sum(fb * gw)

    def loss_tt(sf):
        fb = composite_tiles_train(
            sf, asg.tile_start, asg.tile_count, chunk_size=cfg.chunk_size,
            return_alpha=True, **common,
        )
        return jnp.sum(fb * gw)

    return loss_diff, loss_tt


GRAD_COLS = {"cx": 0, "cy": 1, "A": 2, "B": 3, "C": 4, "op": 5,
             "r": 6, "g": 7, "b": 8}


def _check_grads(sf, asg, cfg, seed=0, rel_tol=1e-4):
    gw = jax.random.normal(
        jax.random.PRNGKey(seed), (4, cfg.height, cfg.width), jnp.float32
    )
    loss_diff, loss_tt = _losses(sf, asg, cfg, gw)
    assert abs(float(loss_diff(sf)) - float(loss_tt(sf))) < 1e-3 * (
        1.0 + abs(float(loss_diff(sf)))
    )
    gd = np.asarray(jax.grad(loss_diff)(sf))
    gt = np.asarray(jax.grad(loss_tt)(sf))
    for name, col in GRAD_COLS.items():
        a, b = gd[:, col], gt[:, col]
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < rel_tol, (name, rel)
    # AABB and depth rows carry no gradient (masks / not differentiated),
    # and lanes beyond the last tile's range stay exactly zero (the
    # zero-donor aliasing + RMW accumulation never touches them).
    assert np.abs(gt[:, 9:]).max() == 0.0
    end = int(np.asarray(asg.tile_start)[-1] + np.asarray(asg.tile_count)[-1])
    assert np.abs(gt[end:]).max() == 0.0


def test_forward_matches_scan_compositor():
    scene = make_random_scene(800, seed=3, scale_range=(0.05, 0.25))
    cfg = RenderConfig(height=128, width=160, compositor="diff")
    assert train_kernel_compatible(cfg.tile_w, cfg.tile_h)
    sf, asg = _pipeline(scene, _camera(160 / 128), cfg)
    common = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=cfg.tile_w,
        tile_h=cfg.tile_h, width=cfg.width, height=cfg.height,
    )
    fb_diff = composite_tiles_diff(
        sf, asg.tile_start, asg.tile_count, chunk_size=cfg.chunk_size,
        max_chunks=cfg.diff_max_chunks, return_alpha=True, **common,
    )
    fb_tt = composite_tiles_train(
        sf, asg.tile_start, asg.tile_count, chunk_size=cfg.chunk_size,
        return_alpha=True, **common,
    )
    # Chunk partitions differ (K-aligned vs start-relative) only inside
    # the 1e-3 stop envelope — the packed-vs-xla agreement bound.
    assert float(jnp.max(jnp.abs(fb_diff - fb_tt))) < 2e-3


def test_backward_matches_autodiff():
    scene = make_random_scene(800, seed=3, scale_range=(0.05, 0.25))
    cfg = RenderConfig(height=128, width=160, compositor="diff")
    sf, asg = _pipeline(scene, _camera(160 / 128), cfg)
    _check_grads(sf, asg, cfg)


def test_backward_matches_autodiff_heavy_overdraw():
    """Early termination, the 0.99 alpha clamp, per-pixel gate freezes,
    and ~30-chunk tiles — the regimes where the reverse walk's checkpoint
    and elasticity bookkeeping must hold up."""
    scene = make_random_scene(4000, seed=11, extent=0.8,
                              scale_range=(0.2, 0.6))
    scene = scene._replace(opacity=jnp.clip(scene.opacity * 4.0, 0.0, 1.0))
    cfg = RenderConfig(height=96, width=96, compositor="diff",
                       diff_max_chunks=64)
    sf, asg = _pipeline(scene, _camera(1.0, pos=(0, 0, 2.5), fov=70.0), cfg)
    assert int(np.asarray(asg.tile_count).max()) > 20 * cfg.chunk_size
    _check_grads(sf, asg, cfg, seed=1)


def test_render_path_uses_kernel_and_matches_scan():
    """render_frame with compositor='diff' dispatches to the kernel when
    diff_kernel=True; flipping the flag must change nothing measurable."""
    import dataclasses

    from gaussianrenderer_tpu.render import render_frame

    scene = make_random_scene(600, seed=5, scale_range=(0.05, 0.2))
    cam = _camera(1.0)
    cfg = RenderConfig(height=64, width=64, compositor="diff",
                       quantize_centers=False)
    fb_kernel, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg)
    fb_scan, _ = render_frame(
        scene, cam.params(cfg.k_sigma),
        dataclasses.replace(cfg, diff_kernel=False),
    )
    assert float(jnp.max(jnp.abs(fb_kernel - fb_scan))) < 2e-3
    # A depth-row request is served by the scan compositor (documented
    # fallback) — same shape contract either way.
    cfg_d = dataclasses.replace(cfg, output_depth=True, output_alpha=True)
    fb_d, _ = render_frame(scene, cam.params(cfg.k_sigma), cfg_d)
    assert fb_d.shape == (5, 64, 64)


def test_seg_gather_transpose_matches_scatter():
    """gather_sorted_features_seg's sort+cumsum gradient transpose must
    reproduce XLA's scatter-add transpose of the plain gather (the
    OneSweep-vs-CUB pattern applied to a VJP)."""
    from gaussianrenderer_tpu.ops.compositing import (
        gather_sorted_features_seg,
    )

    scene = make_random_scene(800, seed=3, scale_range=(0.05, 0.25))
    cfg = RenderConfig(height=128, width=160, compositor="diff")
    cam = _camera(160 / 128)
    pre = functools.partial(
        preprocess_gaussians, width=cfg.width, height=cfg.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y, sh_degree=cfg.sh_degree,
        quantize_centers=False,
    )
    proj = jax.jit(pre)(scene.prepared(), cam.params(3.0))
    cap = cfg.instance_capacity(scene.num_gaussians)
    asg = build_sorted_instances(
        proj, tiles_x=cfg.tiles_x, num_tiles=cfg.num_tiles, capacity=cap,
        depth_scale=cfg.depth_scale, near=0.2, far=100.0,
    )
    feats = build_features(proj)
    common = dict(
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=cfg.tile_w,
        tile_h=cfg.tile_h, width=cfg.width, height=cfg.height,
        chunk_size=cfg.chunk_size, max_chunks=cfg.diff_max_chunks,
    )
    gw = jax.random.normal(
        jax.random.PRNGKey(0), (3, cfg.height, cfg.width), jnp.float32
    )

    def loss(feats, seg):
        g = (
            gather_sorted_features_seg(
                feats, asg, cfg.chunk_size, proj, cap, cfg.num_tiles
            )
            if seg
            else gather_sorted_features(feats, asg, cfg.chunk_size)
        )
        fb = composite_tiles_diff(
            g, asg.tile_start, asg.tile_count, **common
        )
        return jnp.sum(fb * gw)

    assert float(loss(feats, False)) == float(loss(feats, True))
    d_plain = np.asarray(jax.grad(lambda f: loss(f, False))(feats))
    d_seg = np.asarray(jax.grad(lambda f: loss(f, True))(feats))
    rel = np.abs(d_plain - d_seg).max() / (np.abs(d_plain).max() + 1e-12)
    assert rel < 1e-4, rel


def test_calibrate_capacity_probes_views():
    from gaussianrenderer_tpu.train import SceneParams, calibrate_capacity

    scene = make_random_scene(5000, seed=2, scale_range=(0.05, 0.2))
    cfg = RenderConfig(height=128, width=128, compositor="diff")
    cam = _camera(1.0)
    params = SceneParams.from_scene(scene)
    cal = calibrate_capacity(params, [(cam.params(3.0), None)], cfg)
    assert cal.instance_multiplier < cfg.instance_multiplier
    # capacity still covers the true total with headroom
    pre = functools.partial(
        preprocess_gaussians, width=cfg.width, height=cfg.height,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h, tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y, sh_degree=cfg.sh_degree,
    )
    proj = jax.jit(pre)(scene.prepared(), cam.params(3.0))
    w = proj.tile_max[:, 0] - proj.tile_min[:, 0] + 1
    h = proj.tile_max[:, 1] - proj.tile_min[:, 1] + 1
    total = int(jnp.sum(jnp.where(proj.valid, w * h, 0)))
    assert cal.instance_capacity(scene.num_gaussians) >= total
