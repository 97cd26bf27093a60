#!/usr/bin/env python
"""Overdraw/saturation census (VERDICT r4 #1): how much composited work
is provably dead behind T<1e-3 saturation fronts, and how much of it the
frame-coherent per-splat cull (ops/satcull.py) actually recovers.

Per orbit pose, ONE executable computes:

* an UNCULLED packed render (the baseline frame + this pose's exact
  per-16×16-block saturation cutoffs from the kernel census),
* a CULLED render using the PREVIOUS pose's cutoffs — the production
  mechanism exactly (same cull_mask/pyramid/margin code path),
* the per-lane census: for every composited instance, did it change any
  pixel (arrive with alpha ≥ 1e-3 at a pixel whose T was ≥ 1e-3)?
  Plus per-instance sub-block death (all touched 16px blocks saturated
  at arrival — the upper bound of any per-(splat,tile) cull) and
  tile-level death (whole tile saturated — the while_loop early-exit's
  reach),
* the on-device MSE between culled and unculled frames (PSNR honesty).

Output: one JSONL row per pose in overdraw_census.jsonl.

Usage (on the TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/overdraw_census.py \
      --config 7 --frames 6 [--tiers m:k,...] [--margin 0.25]
"""

import argparse
import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_census_fn(cfg):
    import jax
    import jax.numpy as jnp

    from gaussianrenderer_tpu.ops import satcull
    from gaussianrenderer_tpu.ops.instances import (
        ALPHA_EPS,
        build_packed_instances,
        _nscale_prepack,
    )
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
        composite_tiles_packed,
        _center_decode,
        _color_decode,
        _dec_e6m10,
        _dec_s1e6m9,
        _rgb10_decode,
        _u2f,
        T_EPS,
        ALPHA_MAX,
        CENTER_SCALE,
        CENTER_OFFSET,
    )
    from gaussianrenderer_tpu.ops.projection import preprocess_gaussians

    tw, th = cfg.tile_w, cfg.tile_h
    p = tw * th
    K = 128
    GRP = 8  # tiles per batched census step
    bw, bh = tw // 16, th // 16
    nb = bw * bh
    sy, sx = satcull.sat_grid(cfg.tiles_x, cfg.tiles_y, tw, th)

    def census_tiles(packed, tile_start, tile_count, max_chunks):
        """Per-lane contribution census over all tiles, GRP at a time.
        Returns per-tile (contrib, valid, dead_sb, dead_tile) counts and
        per-(tile, block) exact saturation lane indices."""
        num_tiles = cfg.tiles_x * cfg.tiles_y
        ng = -(-num_tiles // GRP)
        pad = ng * GRP - num_tiles
        starts = jnp.pad(tile_start, (0, pad))
        counts = jnp.pad(tile_count, (0, pad))
        tids = jnp.arange(ng * GRP, dtype=jnp.int32)
        txs = tids % cfg.tiles_x
        tys = tids // cfg.tiles_x

        px = jnp.tile(jnp.arange(tw, dtype=jnp.int32), th)  # (P,)
        py = jnp.repeat(jnp.arange(th, dtype=jnp.int32), tw)
        k_iota = jnp.arange(K, dtype=jnp.int32)

        def one_tile(start, count, tx, ty):
            in_img = ((tx * tw + px) < cfg.width) & (
                (ty * th + py) < cfg.height
            )  # (P,)

            def cond(s):
                return s[0] * K < count

            def body(s):
                i, T, contrib, dead_sb, sat = s
                f = jax.lax.dynamic_slice(
                    packed, (0, start + i * K), (5, K)
                )
                raw0, raw1, raw2, raw3, raw4 = (f[j] for j in range(5))
                coarse = (raw3 >> 30) & 0x1
                c_scale = jnp.where(coarse != 0, 1.0, 1.0 / CENTER_SCALE)
                c_bias = jnp.where(coarse != 0, 32768.0, CENTER_OFFSET)
                cx = _u2f(raw0 >> 16) * c_scale - c_bias  # (K,)
                cy = _u2f(raw0 & 0xFFFF) * c_scale - c_bias
                chu = _dec_e6m10(raw1 >> 16)
                chw = _dec_e6m10(raw1 & 0xFFFF)
                chv = _dec_s1e6m9(raw2 >> 16)
                ca = chu * chu
                cb = 2.0 * chu * chv
                cc = chv * chv + chw * chw
                op = jnp.maximum(_color_decode(raw2 & 0xFFFF), 1e-6)
                aabb = raw4.astype(jnp.int32)
                xmin = aabb & 0xFF
                ymin = (aabb >> 8) & 0xFF
                xmax = (aabb >> 16) & 0xFF
                ymax = (aabb >> 24) & 0xFF

                dx = px[:, None].astype(jnp.float32) - cx[None, :]  # (P,K)
                dy = py[:, None].astype(jnp.float32) - cy[None, :]
                md2 = (ca * dx + cb * dy) * dx + cc * dy * dy
                alpha = jnp.minimum(op * jnp.exp(-0.5 * md2), ALPHA_MAX)
                inside = (
                    (px[:, None] >= xmin) & (px[:, None] <= xmax)
                    & (py[:, None] >= ymin) & (py[:, None] <= ymax)
                )
                lane_ok = (i * K + k_iota) < count
                alpha = jnp.where(
                    inside & (alpha >= ALPHA_EPS) & lane_ok & in_img[:, None],
                    alpha,
                    0.0,
                )
                u = jnp.cumprod(1.0 - alpha, axis=1)
                u_excl = jnp.concatenate(
                    [jnp.ones((p, 1)), u[:, :-1]], axis=1
                )
                t_before = T[:, None] * u_excl  # (P, K)
                changed = jnp.any(
                    (alpha > 0.0) & (t_before >= T_EPS), axis=0
                )  # (K,)
                contrib = contrib + jnp.sum(
                    (changed & lane_ok).astype(jnp.int32)
                )
                # per-block EXCLUSIVE max T at each lane's arrival
                tb = jnp.where(in_img[:, None], t_before, 0.0)
                bm = (
                    tb.reshape(bh, 16, bw, 16, K).max(axis=(1, 3))
                )  # (bh, bw, K)
                # blocks the lane's AABB touches (tile-local)
                bx0 = jnp.clip(xmin // 16, 0, bw - 1)
                bx1 = jnp.clip(xmax // 16, 0, bw - 1)
                by0 = jnp.clip(ymin // 16, 0, bh - 1)
                by1 = jnp.clip(ymax // 16, 0, bh - 1)
                b_y = jnp.arange(bh, dtype=jnp.int32)
                b_x = jnp.arange(bw, dtype=jnp.int32)
                touched = (
                    (b_y[:, None, None] >= by0) & (b_y[:, None, None] <= by1)
                    & (b_x[None, :, None] >= bx0)
                    & (b_x[None, :, None] <= bx1)
                )  # (bh, bw, K)
                reach = jnp.max(
                    jnp.where(touched, bm, 0.0), axis=(0, 1)
                )  # (K,)
                dead_sb = dead_sb + jnp.sum(
                    ((reach < T_EPS) & lane_ok).astype(jnp.int32)
                )
                # exact per-block saturation lane index (first lane whose
                # INCLUSIVE T drops the block max below T_EPS)
                t_incl = jnp.where(in_img[:, None], T[:, None] * u, 0.0)
                bi = t_incl.reshape(bh, 16, bw, 16, K).max(axis=(1, 3))
                below = (bi < T_EPS) & lane_ok[None, None, :]
                first = jnp.argmax(below, axis=2).astype(jnp.int32)
                has = jnp.any(below, axis=2)
                cand = jnp.where(
                    has, start + i * K + first, jnp.int32(2**30)
                ).reshape(nb)
                sat = jnp.minimum(sat, cand)
                T = T * u[:, -1]
                return i + 1, T, contrib, dead_sb, sat

            init = (
                jnp.int32(0),
                jnp.ones((p,), jnp.float32),
                jnp.int32(0),
                jnp.int32(0),
                jnp.full((nb,), jnp.int32(2**30)),
            )
            _, T_fin, contrib, dead_sb, sat = jax.lax.while_loop(
                cond, body, init
            )
            # tile-level saturation: all blocks (of in-image pixels) done
            tile_sat = jnp.max(sat)
            dead_tile = jnp.where(
                tile_sat < 2**30,
                jnp.maximum(count - (tile_sat - start + 1), 0),
                0,
            )
            return contrib, count, dead_sb, dead_tile, sat

        def group(args):
            return jax.vmap(one_tile)(*args)

        xs = (
            starts.reshape(ng, GRP),
            counts.reshape(ng, GRP),
            txs.reshape(ng, GRP),
            tys.reshape(ng, GRP),
        )
        outs = jax.lax.map(group, xs)
        contrib, valid, dead_sb, dead_tile, sat = (
            o.reshape(-1, *o.shape[2:])[: cfg.tiles_x * cfg.tiles_y]
            for o in outs
        )
        return contrib, valid, dead_sb, dead_tile, sat.reshape(-1)

    def _proj_pk(scene, cam):
        proj = preprocess_gaussians(
            scene, cam,
            width=cfg.width, height=cfg.height,
            tile_w=tw, tile_h=th,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            sh_degree=cfg.sh_degree,
            quantize_centers=cfg.quantize_centers,
            ewa_dilation=cfg.ewa_dilation,
            ewa_compensate=cfg.ewa_compensate,
        )
        pk = _nscale_prepack(
            proj, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            tile_w=tw, tile_h=th,
        )
        return proj, pk

    def _step(cam):
        depth_bits = min(32 - max(int(cfg.num_tiles).bit_length(), 1), 24)
        return (jnp.float32(cam.far) - jnp.float32(cam.near)) / float(
            (1 << depth_bits) - 1
        )

    @jax.jit
    def census_a(scene, cam, sat_prev):
        """Unculled render + per-lane census + cutoffs + mechanism
        counts. (Split from the culled render: one combined executable
        OOMs HBM at the 3M c4 shape.)"""
        proj, pk = _proj_pk(scene, cam)
        step = _step(cam)

        # ---- A: unculled render + kernel sat census
        inst = build_packed_instances(
            proj, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            tile_w=tw, tile_h=th, near=cam.near, far=cam.far,
            tiers=cfg.tiers, want_depth=True,
        )
        fb_a, sat_idx = composite_tiles_packed(
            inst.packed_feats, inst.tile_start, inst.tile_count,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=tw, tile_h=th,
            width=cfg.width, height=cfg.height, chunk=cfg.packed_chunk,
            with_sat=True,
        )
        cutoff_now = satcull.cutoff_from_sat(
            sat_idx, inst.depth_f32,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=tw, tile_h=th,
        )

        # ---- census pass over A's composited stream
        contrib, valid, dead_sb, dead_tile, _ = census_tiles(
            inst.packed_feats, inst.tile_start, inst.tile_count, None
        )

        # ---- mechanism counts, same pose (ideal) and prev pose
        def mech(cutoff):
            culled = satcull.cull_mask(
                pk.valid, proj.depth, proj.aabb_px,
                satcull.build_pyramid(cutoff), sx=sx, sy=sy,
                margin=cfg.sat_margin, depth_step=step,
            )
            return culled, jnp.sum(culled.astype(jnp.int32)), jnp.sum(
                jnp.where(culled, pk.eff, 0)
            )

        _, now_splats, now_eff = mech(cutoff_now)
        sat_eff = satcull.dilate_cutoff(sat_prev, cfg.sat_dilate)
        _, prev_splats, prev_eff = mech(sat_eff)

        return dict(
            instances=inst.total_instances,
            contrib=jnp.sum(contrib),
            valid_lanes=jnp.sum(valid),
            dead_sb=jnp.sum(dead_sb),
            dead_tile=jnp.sum(dead_tile),
            sat_blocks=jnp.sum(
                (cutoff_now < satcull.SAT_NONE).astype(jnp.int32)
            ),
            now_splats=now_splats,
            now_eff=now_eff,
            prev_splats=prev_splats,
            prev_eff=prev_eff,
            overflow=inst.overflow,
            cutoff=cutoff_now,
        ), fb_a

    @jax.jit
    def census_b(scene, cam, sat_prev, fb_a):
        """The FULL production culled render (per-splat + per-position,
        dilation + margins) and its on-device MSE vs the unculled frame."""
        proj, pk = _proj_pk(scene, cam)
        step = _step(cam)
        sat_eff = satcull.dilate_cutoff(sat_prev, cfg.sat_dilate)
        culled_prev = satcull.cull_mask(
            pk.valid, proj.depth, proj.aabb_px,
            satcull.build_pyramid(sat_eff), sx=sx, sy=sy,
            margin=cfg.sat_margin, depth_step=step,
        )
        proj_c = proj._replace(valid=proj.valid & ~culled_prev)
        cut_q = satcull.tile_cutoff_q(
            sat_eff, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            tile_w=tw, tile_h=th, near=cam.near, depth_step=step,
            margin=cfg.sat_margin,
        )
        inst_c = build_packed_instances(
            proj_c, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
            tile_w=tw, tile_h=th, near=cam.near, far=cam.far,
            tiers=cfg.tiers, want_depth=True, sat_cut_q=cut_q,
        )
        fb_b = composite_tiles_packed(
            inst_c.packed_feats, inst_c.tile_start, inst_c.tile_count,
            tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=tw, tile_h=th,
            width=cfg.width, height=cfg.height, chunk=cfg.packed_chunk,
        )
        return dict(
            instances_culled_run=inst_c.total_instances,
            mse=jnp.mean((fb_a - fb_b) ** 2),
            overflow_b=inst_c.overflow,
        )

    def census_step(scene, cam, sat_prev):
        ra, fb_a = census_a(scene, cam, sat_prev)
        rb = census_b(scene, cam, sat_prev, fb_a)
        ra.update(rb)
        ra["overflow"] = ra["overflow"] | ra.pop("overflow_b")
        return ra

    return census_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7")
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--orbit-deg", type=float, default=None,
                    help="degrees per pose (default 360/frames)")
    ap.add_argument("--tiers", default=None)
    ap.add_argument("--margin", type=float, default=None)
    ap.add_argument("--out", default="overdraw_census.jsonl")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from gaussianrenderer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from bench_suite import build
    from gaussianrenderer_tpu.ops import satcull
    from gaussianrenderer_tpu.render import parse_tiers
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.utils import JsonlWriter

    scene, cfg, pos, _ = build(args.config, args.frames)
    if args.tiers is None:
        sub = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "bench_suite.py"),
             "--config", args.config, "--calibrate-only"],
            capture_output=True, text=True, timeout=3600,
        )
        tier_str = (
            sub.stdout.strip().splitlines()[-1] if sub.stdout.strip() else ""
        )
        if sub.returncode == 0 and ":" in tier_str:
            cfg = dataclasses.replace(cfg, tiers=parse_tiers(tier_str))
            log(f"calibrated tiers: {cfg.tiers}")
        else:
            log(f"calibration failed, default ladder\n{sub.stderr[-400:]}")
    else:
        cfg = dataclasses.replace(cfg, tiers=parse_tiers(args.tiers))
    if cfg.tiers and int(cfg.tiers[0][0]) == 0:
        cfg = dataclasses.replace(
            cfg, packed_chunk=cfg.auto_packed_chunk(int(cfg.tiers[0][1]))
        )
    if args.margin is not None:
        cfg = dataclasses.replace(cfg, sat_margin=args.margin)
    scene = scene.prepared()

    cam = Camera()
    cam.set_position(list(pos))
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(cfg.width / cfg.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()

    census_step = make_census_fn(cfg)
    sat = satcull.initial_cutoff(
        cfg.tiles_x, cfg.tiles_y, cfg.tile_w, cfg.tile_h
    )
    out = JsonlWriter(args.out)
    deg = args.orbit_deg if args.orbit_deg is not None else 360.0 / args.frames
    t0 = time.time()
    for f in range(args.frames):
        cam.orbit(deg, 0.0)
        cam.update_camera_matrices()
        p = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x)),
            cam.params(cfg.k_sigma),
        )
        r = census_step(scene, p, sat)
        sat = r.pop("cutoff")
        row = {k: (float(v) if k == "mse" else int(v)) for k, v in r.items()}
        inst = max(row["instances"], 1)
        row.update(
            config=args.config,
            pose=f,
            orbit_deg=deg,
            margin=cfg.sat_margin,
            dead_frac=round(1.0 - row["contrib"] / inst, 4),
            dead_sb_frac=round(row["dead_sb"] / inst, 4),
            dead_tile_frac=round(row["dead_tile"] / inst, 4),
            mech_now_frac=round(row["now_eff"] / inst, 4),
            mech_prev_frac=round(row["prev_eff"] / inst, 4),
            psnr=round(
                10 * __import__("math").log10(1.0 / row["mse"]), 1
            ) if row["mse"] > 0 else 120.0,
            tiers=list(cfg.tiers) if cfg.tiers else None,
        )
        out.write(**row)
        log(f"[census {args.config}] pose {f}: {json.dumps(row)}")
        if f == 0:
            log(f"first pose (compile+run): {time.time()-t0:.1f}s")
    log("done")


if __name__ == "__main__":
    main()
