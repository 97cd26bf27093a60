#!/usr/bin/env python
"""Non-toy multichip validation on the virtual CPU mesh (VERDICT r3 #2).

Runs the FULL packed strip pipeline — calibrated compacted ladder,
load-balanced strip bounds, every exchange mode (legacy f32 gather,
quantized gather, ownership all_to_all with calibrated windows) — over a
≥100k-splat TPU-TRAINED scene (data/trained_100k.ply) on an 8-device
virtual CPU mesh, and pins:

* image equality vs the single-chip packed render (max|Δ| and PSNR);
* zero overflow at calibrated ladders/caps, overflow=True when the
  exchange windows are deliberately starved (never silent);
* the per-mode exchange wire bytes per chip per frame (the data-plane
  table's measured byte column).

Appends one JSONL row per mode to multichip_scale.jsonl.

Usage:  python tools/multichip_scale_probe.py [--devices 8]
        [--ply data/trained_100k.ply] [--res 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--ply", default="data/trained_100k.ply")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--out", default="multichip_scale.jsonl")
    args = ap.parse_args()

    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.ops.instances import EXCHANGE_ROWS
    from gaussianrenderer_tpu.parallel import (
        a2a_caps_for_scene,
        balance_strips_for_scene,
        make_mesh,
        render_frame_multichip,
        shard_scene,
    )
    from gaussianrenderer_tpu.render import (
        area_histogram,
        calibrate_tiers,
        render_frame,
    )
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import load_ply

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    d = args.devices
    assert len(jax.devices()) >= d, "virtual mesh under-provisioned"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = load_ply(os.path.join(repo, args.ply), max_sh_degree=1)
    n = scene.num_gaussians
    cam = Camera()
    cam.set_position([3.9, 1.5, 3.9])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(1.0)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(
        height=args.res, width=args.res, sh_degree=1, compositor="packed"
    )
    cp = cam.params(cfg.k_sigma)

    # Session calibration, exactly like make_renderer(auto_tier=True):
    # scene-calibrated COMPACTED ladder + balanced strip bounds + a2a caps.
    from gaussianrenderer_tpu.render import emission_total

    hist = area_histogram(scene, cp, cfg)
    tiers = calibrate_tiers(
        hist, num_tiles=cfg.num_tiles,
        emission_max=emission_total(scene, cp, cfg),
    )
    cfg = RenderConfig(**{**cfg.__dict__, "tiers": tiers})
    bounds = balance_strips_for_scene(scene, cp, cfg, d)
    caps = a2a_caps_for_scene(scene, cp, cfg, d, strip_bounds=bounds)
    log(f"scene n={n} ladder={tiers} bounds={bounds} caps={caps}")

    t0 = time.time()
    fb_single, st = render_frame(scene, cp, cfg)
    fb_single.block_until_ready()
    log(
        f"single-chip: {time.time()-t0:.1f}s inst={int(st.num_instances)} "
        f"overflow={bool(st.overflow)}"
    )
    assert not bool(st.overflow), "calibrated ladder must not overflow"

    mesh = make_mesh(jax.devices()[:d])
    sharded = shard_scene(scene, mesh)
    ns = -(-n // d)
    rec_bytes = {
        "gather32": 22 * 4 * n,  # every chip receives the full N record
        "gather_q": EXCHANGE_ROWS * 4 * n,
        "a2a_q": EXCHANGE_ROWS * 4 * d * sum(int(c) for c in caps),
    }
    rows = []
    for ex in ("gather32", "gather_q", "a2a_q"):
        kw = {"a2a_caps": caps} if ex == "a2a_q" else {}
        t0 = time.time()
        fb, stats = render_frame_multichip(
            sharded, cp, cfg, mesh, strip_bounds=bounds, exchange=ex, **kw
        )
        fb.block_until_ready()
        dt = time.time() - t0
        diff = float(jnp.max(jnp.abs(fb - fb_single)))
        mse = float(jnp.mean((fb - fb_single) ** 2))
        psnr = 99.0 if mse < 1e-12 else float(10 * np.log10(1.0 / mse))
        row = dict(
            ts=time.time(),
            probe="multichip_scale",
            ply=args.ply,
            gaussians=n,
            resolution=f"{args.res}x{args.res}",
            devices=d,
            exchange=ex,
            strip_bounds=list(bounds),
            a2a_caps=list(caps) if ex == "a2a_q" else None,
            tiers=[list(t) for t in tiers],
            instances=int(st.num_instances),
            overflow=bool(stats["overflow"]),
            center_clipped=bool(stats["center_clipped"]),
            max_abs_diff=diff,
            psnr_vs_single=round(psnr, 2),
            recv_bytes_per_chip=rec_bytes[ex],
            wall_s=round(dt, 1),
        )
        rows.append(row)
        log(f"{ex}: maxdiff={diff:.2e} psnr={psnr:.1f} dB "
            f"overflow={row['overflow']} recv={rec_bytes[ex]/1e6:.1f} MB "
            f"({dt:.0f}s)")
        assert not row["overflow"], f"{ex}: unexpected overflow"
        assert psnr > 60.0, f"{ex}: image diverged ({psnr} dB)"

    # Starved exchange windows must FLAG, not silently truncate.
    _, stats = render_frame_multichip(
        sharded, cp, cfg, mesh, strip_bounds=bounds,
        exchange="a2a_q", a2a_caps=(64, 16),
    )
    assert bool(stats["overflow"]), "starved a2a caps must flag overflow"
    log("starved-caps overflow flag: OK")
    rows.append(dict(
        ts=time.time(), probe="multichip_scale_starved", ply=args.ply,
        devices=d, exchange="a2a_q", a2a_caps=[64, 16],
        overflow=True,
    ))

    out = os.path.join(repo, args.out)
    with open(out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(json.dumps(rows[-2]))


if __name__ == "__main__":
    main()
