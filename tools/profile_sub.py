#!/usr/bin/env python
"""Sub-stage profiling: build_packed internals + preprocess internals."""

import argparse
import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from gaussianrenderer_tpu.utils.timing import device_time, measure_floor


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--instance-multiplier", type=float, default=8.0)
    args = ap.parse_args()

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.ops import instances as inst_mod
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians
    from gaussianrenderer_tpu.ops.sh import eval_sh
    from gaussianrenderer_tpu.ops.tiling import expand_instances
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene

    log(f"devices: {jax.devices()}")
    floor = measure_floor()
    log(f"floor: {floor:.1f}")
    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor="packed",
        instance_multiplier=args.instance_multiplier,
    )
    scene = make_random_scene(args.gaussians, seed=0).to_device()
    cam = Camera()
    cam.set_position([0.0, 0.0, 6.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(args.width / args.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    params = cam.params(cfg.k_sigma)
    capacity = cfg.instance_capacity(scene.num_gaussians)
    log(f"capacity={capacity} tiles={cfg.tiles_x}x{cfg.tiles_y}")

    def t(name, fn, *a, iters=8):
        ms = device_time(fn, *a, iters=iters, floor=floor)
        log(f"{name:42s} {ms:9.3f} ms")

    # ---------------- preprocess internals
    pos = scene.positions
    t("sh eval deg2 (N)", lambda p: eval_sh(scene.sh, p / jnp.linalg.norm(p, axis=-1, keepdims=True), 2), pos)

    def covchain(p):
        from gaussianrenderer_tpu.ops.projection import quat_to_rotmat
        rot = quat_to_rotmat(scene.quats)
        s2 = jnp.square(scene.scales)
        cov3d = jnp.einsum("nij,nj,nkj->nik", rot, s2, rot, precision=jax.lax.Precision.HIGHEST)
        cov_cam = jnp.einsum("ij,njk,lk->nil", params.r_cam, cov3d, params.r_cam, precision=jax.lax.Precision.HIGHEST)
        return cov_cam + p[:, :, None] * 0.0

    t("cov chain einsums (N)", covchain, pos[:, :3].reshape(-1, 3)[:, :3], iters=8)

    pre = functools.partial(
        preprocess_gaussians,
        width=cfg.width, height=cfg.height, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, sh_degree=cfg.sh_degree,
    )
    proj = jax.jit(pre)(scene, params)
    proj = jax.tree_util.tree_map(lambda x: x.copy(), proj)

    # ---------------- build_packed internals
    tile_bits = max(int(cfg.num_tiles).bit_length(), 1)
    depth_bits = min(32 - tile_bits, 24)

    def expansion_only(proj):
        key, gid, total, in_range, _ = expand_instances(
            proj, tiles_x=cfg.tiles_x, num_tiles=cfg.num_tiles,
            capacity=capacity, depth_bits=depth_bits,
            near=jnp.float32(0.2), far=jnp.float32(100.0), features_u32=None,
        )
        return key, gid

    t("expand keys only (4 fields)", expansion_only, proj)

    def expansion_full(proj):
        fields = [jax.lax.bitcast_convert_type(proj.depth + i, jnp.uint32) for i in range(10)]
        key, gid, total, in_range, fs = expand_instances(
            proj, tiles_x=cfg.tiles_x, num_tiles=cfg.num_tiles,
            capacity=capacity, depth_bits=depth_bits,
            near=jnp.float32(0.2), far=jnp.float32(100.0), features_u32=fields,
        )
        return (key, *fs)

    t("expand keys + 10 fields", expansion_full, proj)

    # sort alone on realistic data
    build = functools.partial(
        inst_mod.build_packed_instances,
        tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=cfg.tile_w,
        tile_h=cfg.tile_h, capacity=capacity, near=0.2, far=100.0,
    )
    inst = jax.jit(build)(proj)
    key_unsorted = jnp.asarray(
        __import__("numpy").random.default_rng(0).permutation(
            __import__("numpy").asarray(inst.packed_feats[0]).view("uint32")
        )
    )
    rows = [inst.packed_feats[i].copy() for i in range(inst.packed_feats.shape[0])]

    t("sort 1key+payload rows (C)", lambda k: jax.lax.sort((k, *rows), num_keys=1, is_stable=True), key_unsorted, iters=5)
    t("sort 1key+1row (C)", lambda k: jax.lax.sort((k, rows[0]), num_keys=1, is_stable=True), key_unsorted, iters=5)
    t("sort 1key only (C)", lambda k: jax.lax.sort((k,), num_keys=1, is_stable=True)[0], key_unsorted, iters=5)

    # searchsorted for tile ranges
    ks = jnp.sort(key_unsorted)
    tids = jnp.arange(cfg.num_tiles, dtype=jnp.int32)

    def ranges(k):
        ts = (k >> depth_bits).astype(jnp.int32)
        return jnp.searchsorted(ts, tids, side="left")

    t("tile ranges searchsorted (T)", ranges, ks)

    t("build_packed total", build, proj)


if __name__ == "__main__":
    main()
