"""Streaming-training demo: fit a scene to target renders, with ADC.

The reference lists training as unfinished roadmap work (reference
``README.md:17`` — "Training Gaussians on the fly"); this executable
demonstrates the TPU-native implementation end-to-end: a ground-truth
scene renders target frames from a handful of orbit poses, a perturbed
copy is optimized back toward them with the jit Adam/MSE step, and the
adaptive-density-control loop (``densify_step``) recycles dead splats
into high-gradient donors every ``--densify-every`` steps.

Prints a loss trajectory and the final PSNR against the target frame;
exits 0 when the loss fell and the densify episodes reported sane
bookkeeping (recycled ≤ dead slots).
"""

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400, help="splat budget")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--poses", type=int, default=3)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument(
        "--optimizer", default="adam", choices=["adam", "3dgs"],
        help="adam: one global --lr; 3dgs: the paper's per-group rates "
        "(positions decayed, SH bands split, opacity/scale/quat groups)",
    )
    ap.add_argument("--densify-every", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.oracle import psnr
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.train import (
        DensifyState,
        SceneParams,
        densify_step,
        make_3dgs_optimizer,
        make_optimizer,
        mse_loss,
        render_for_training,
    )

    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor="xla",
        diff_max_chunks=8,
    )

    def pose(i: int) -> Camera:
        cam = Camera()
        cam.set_position([0.0, 0.0, 5.0])
        cam.set_look_at([0.0, 0.0, 0.0])
        cam.set_fov_y(60.0)
        cam.set_aspect_ratio(args.width / args.height)
        cam.set_clipping_planes(0.2, 100.0)
        cam.update_camera_matrices()
        cam.orbit(12.0 * i, 4.0 * i)
        cam.update_camera_matrices()
        return cam

    # Ground truth and its target frames.
    truth = make_random_scene(args.n, seed=args.seed + 1,
                              scale_range=(0.05, 0.2))
    truth_params = SceneParams.from_scene(truth)
    cams = [pose(i).params(cfg.k_sigma) for i in range(args.poses)]
    targets = [render_for_training(truth_params, c, cfg) for c in cams]

    # Start: same budget, perturbed positions + uniform mid opacity.
    start = make_random_scene(args.n, seed=args.seed + 2,
                              scale_range=(0.05, 0.2))
    params = SceneParams.from_scene(start)
    if args.optimizer == "3dgs":
        extent = float(np.abs(np.asarray(start.positions)).max())
        optimizer = make_3dgs_optimizer(
            scene_extent=extent, position_lr_max_steps=args.steps
        )
    else:
        optimizer = make_optimizer(args.lr)
    opt_state = optimizer.init(params)
    dstate = DensifyState.zero(args.n)

    from gaussianrenderer_tpu.train import _make_step_fn

    # The shared densify-aware step body (view-space ADC gradients).
    step = _make_step_fn(cfg, optimizer, mse_loss, timed=False, densify=True)

    losses = []
    episodes = []
    for s in range(args.steps):
        i = s % args.poses
        params, opt_state, dstate, loss, _needed = step(
            params, opt_state, dstate, cams[i], targets[i]
        )
        losses.append(float(loss))
        if (s + 1) % args.densify_every == 0:
            params, opt_state, dstate, info = densify_step(
                params, opt_state, dstate, seed=s + 1
            )
            rec = int(info["recycled"])
            dead = int(info["dead"])
            episodes.append((rec, dead))
            print(f"step {s + 1}: densify recycled={rec} dead={dead}")

    fb = render_for_training(params, cams[0], cfg)
    final_psnr = psnr(np.asarray(fb), np.asarray(targets[0]))
    print(f"loss: {losses[0]:.5f} -> {losses[-1]:.5f} "
          f"({len(losses)} steps, {args.poses} poses)")
    print(f"final PSNR vs target pose 0: {final_psnr:.2f} dB")

    ok = losses[-1] < losses[0]
    for rec, dead in episodes:
        ok = ok and 0 <= rec <= dead
    if not ok:
        print("FAIL: loss did not decrease or densify bookkeeping broken",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
