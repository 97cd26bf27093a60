#!/usr/bin/env python
"""Train a production-scale 3DGS scene fixture with the full fit_scene loop.

Extends tools/make_trained_fixture.py (the small CI fixture) to the
garden-class regime: a clustered multi-view target scene is rendered with
the packed TPU pipeline, then a fresh cloud is fit with the complete
training stack — Pallas forward+backward compositor, the upstream 3DGS
per-group optimizer, adaptive density control with slot recycling, probed
instance capacity — and evaluated on held-out views (train.evaluate).

The reference was validated on real trained captures (reference
README.md:23); with zero network egress in this container the closest
attainable evidence is a scene whose parameter statistics come from
actual gradient descent through this renderer at bench scale. Output
feeds the c8 bench row (tools/bench_suite.py).

Recipe for the committed 500k scene (run on the real TPU):
  python tools/make_trained_scene.py --tpu --n-target 700000 \
      --n-fit 500000 --steps 2000 --views 16 --holdout 4 \
      --height 480 --width 640 --densify-every 200 \
      --out data/trained_500k.ply
"""

import argparse
import hashlib
import json
import os
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def orbit_cams(n, h, w, *, radius=5.5, heights=(1.0, 2.4), fov=60.0,
               k_sigma=3.0, phase=0.0):
    from gaussianrenderer_tpu.scene.camera import Camera

    cams = []
    for i in range(n):
        ang = 2.0 * np.pi * (i + phase) / n
        cam = Camera()
        cam.set_position(
            [radius * np.sin(ang), heights[i % len(heights)],
             radius * np.cos(ang)]
        )
        cam.set_look_at([0.0, 0.0, 0.0])
        cam.set_fov_y(fov)
        cam.set_aspect_ratio(w / h)
        cam.set_clipping_planes(0.2, 100.0)
        cam.update_camera_matrices()
        cams.append(cam.params(k_sigma))
    return cams


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-target", type=int, default=70_000)
    ap.add_argument("--n-fit", type=int, default=50_000)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--holdout", type=int, default=3)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--sh-degree", type=int, default=1,
                    help="SH degree of the FITTED scene (sets PLY size)")
    ap.add_argument("--densify-every", type=int, default=0)
    ap.add_argument("--target", choices=["clustered", "surface"],
                    default="clustered",
                    help="target scene family: capture-statistics fog "
                    "(clustered) or recognizable parametric geometry "
                    "(surface — legible demo media)")
    ap.add_argument("--loss", choices=["mse", "l1_dssim"], default="l1_dssim")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--out", default="data/trained_500k.ply")
    ap.add_argument("--jsonl", default="train_scene.jsonl")
    args = ap.parse_args()

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.render import render_frame
    from gaussianrenderer_tpu.scene.io import make_clustered_scene, save_ply
    from gaussianrenderer_tpu import train

    h, w = args.height, args.width
    cfg = RenderConfig(height=h, width=w, compositor="diff",
                       sh_degree=args.sh_degree)
    # Targets render through the packed inference path (the trainer never
    # sees them being made, so the full-speed pipeline is fine here).
    tcfg = RenderConfig(height=h, width=w, compositor="packed", sh_degree=2)
    if args.target == "surface":
        from gaussianrenderer_tpu.scene.io import make_surface_scene

        target_scene = make_surface_scene(args.n_target, seed=7, sh_degree=2)
    else:
        target_scene = make_clustered_scene(args.n_target, seed=7,
                                            sh_degree=2)

    n_all = args.views + args.holdout
    cams = orbit_cams(n_all, h, w, k_sigma=tcfg.k_sigma)
    log(f"rendering {n_all} target views at {w}x{h} "
        f"({args.n_target} target splats)...")
    t0 = time.time()
    views = []
    for i, cam in enumerate(cams):
        fb, _ = render_frame(target_scene, cam, tcfg)
        views.append((cam, jnp.asarray(fb)))
        log(f"  view {i} ({time.time()-t0:.0f}s)")
    train_views = views[: args.views]
    heldout = views[args.views:]

    # Init like a real pipeline seeds from SfM points: jittered position
    # subsample, DC color carried over, mid opacity, small isotropic scales.
    rng = np.random.default_rng(0)
    idx = rng.choice(args.n_target, args.n_fit, replace=False)
    pos0 = np.asarray(target_scene.positions)[idx] + rng.normal(
        0, 0.03, (args.n_fit, 3)
    )
    n_coeff = 3 * (args.sh_degree + 1) ** 2
    sh0 = np.zeros((args.n_fit, n_coeff), np.float32)
    sh0[:, :3] = np.asarray(target_scene.sh)[idx, :3]
    sh0[:, 3:] = rng.normal(0, 0.05, (args.n_fit, n_coeff - 3))
    params = train.SceneParams(
        positions=jnp.asarray(pos0, jnp.float32),
        sh=jnp.asarray(sh0),
        raw_opacity=jnp.full((args.n_fit,), -1.0, jnp.float32),
        raw_scales=jnp.full((args.n_fit, 3), np.log(0.04), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(args.n_fit, 4)), jnp.float32),
    )

    loss_fn = train.mse_loss if args.loss == "mse" else train.l1_dssim_loss
    t0 = time.time()
    params, history = train.fit_scene(
        train_views,
        cfg,
        params,
        steps=args.steps,
        loss_fn=loss_fn,
        densify_every=args.densify_every,
        log_fn=lambda s, l: log(
            f"step {s:5d} loss {l:.5f} ({time.time()-t0:.0f}s)"
        ),
        log_every=100,
    )
    fit_s = time.time() - t0
    log(f"fit done in {fit_s:.0f}s; densify episodes: "
        f"{len(history['densify'])}")

    metrics = train.evaluate(params, heldout, cfg)
    log(f"held-out PSNR {metrics['psnr']:.2f} dB  SSIM {metrics['ssim']:.4f}")

    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_ply(params.to_scene(), out)
    sha = hashlib.sha256(open(out, "rb").read()).hexdigest()
    row = {
        "ts": time.time(),
        "out": os.path.relpath(out),
        "sha256": sha,
        "size_mb": round(os.path.getsize(out) / 1e6, 1),
        "n_target": args.n_target,
        "n_fit": args.n_fit,
        "steps": args.steps,
        "views": args.views,
        "holdout": args.holdout,
        "resolution": f"{w}x{h}",
        "loss": args.loss,
        "densify_every": args.densify_every,
        "densify_episodes": len(history["densify"]),
        "fit_s": round(fit_s, 1),
        "final_loss": history["losses"][-1],
        "heldout_psnr": round(metrics["psnr"], 2),
        "heldout_ssim": round(metrics["ssim"], 4),
    }
    with open(args.jsonl, "a") as f:
        f.write(json.dumps(row) + "\n")
    log(f"wrote {out} ({row['size_mb']} MB)")
    log(f"sha256 {sha}")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
