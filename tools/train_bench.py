#!/usr/bin/env python
"""Training-step benchmark on the real TPU (single chip).

The reference lists training as unimplemented roadmap
(reference README.md:17); there is no baseline number to beat, so this
harness RECORDS the capability: ms per Adam step (forward + backward
through the differentiable pipeline) and ms per densify episode at a
given scene scale, appended as JSON lines to train_bench.jsonl.

Methodology matches PERF_NOTES (tunnel): the step loop runs inside one
jitted fori_loop with per-iteration camera perturbation, one sync,
measured floor subtracted (utils.timing.device_time).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100_000)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stage", default="step", choices=["step", "densify"])
    ap.add_argument("--no-kernel", action="store_true",
                    help="force the lax.scan diff compositor (A/B baseline)")
    ap.add_argument("--out", default="train_bench.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gaussianrenderer_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")

    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.scene.camera import Camera
    from gaussianrenderer_tpu.scene.io import make_random_scene
    from gaussianrenderer_tpu.train import (
        DensifyState,
        SceneParams,
        calibrate_capacity,
        densify_step,
        mse_loss,
        render_for_training,
    )
    from gaussianrenderer_tpu.utils.timing import device_time, measure_floor

    cfg = RenderConfig(
        height=args.height,
        width=args.width,
        compositor="diff",
        diff_max_chunks=32,
        diff_kernel=not args.no_kernel,
    )
    scene = make_random_scene(
        args.gaussians, seed=0, extent=4.0, scale_range=(0.004, 0.03)
    )
    cam = Camera()
    cam.set_position([0.0, 1.0, 8.0])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(70.0)
    cam.set_aspect_ratio(args.width / args.height)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cam_p = cam.params(cfg.k_sigma)

    params = SceneParams.from_scene(scene)
    cfg = calibrate_capacity(params, [(cam_p, None)], cfg)
    log(f"calibrated instance_multiplier: {cfg.instance_multiplier:.2f}")
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    floor = measure_floor()
    log(f"floor: {floor:.1f} ms")

    t0 = time.time()
    if args.stage == "step":
        target = jax.jit(
            lambda p, c: render_for_training(p, c, cfg)
        )(params, cam_p)
        target = target.copy()

        def one_step(params, opt_state, cam_p, target):
            loss, grads = jax.value_and_grad(mse_loss)(
                params, cam_p, target, cfg
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        ms = device_time(
            one_step, params, opt_state, cam_p, target,
            iters=args.iters, floor=floor,
        )
    else:
        state = DensifyState(
            grad_accum=jnp.abs(
                jax.random.normal(jax.random.PRNGKey(0), (args.gaussians,))
            ),
            denom=jnp.full((args.gaussians,), 100.0, jnp.float32),
            steps=jnp.int32(100),
        )

        def one_densify(params, opt_state, state):
            return densify_step.__wrapped__(  # the un-jitted body
                params, opt_state, state,
                grad_threshold=2e-4, prune_opacity=5e-3,
                split_scale_pct=0.75, seed=0,
            )

        ms = device_time(
            one_densify, params, opt_state, state,
            iters=args.iters, floor=floor,
        )

    rec = {
        "stage": args.stage,
        "gaussians": args.gaussians,
        "resolution": f"{args.width}x{args.height}",
        "diff_kernel": not args.no_kernel,
        "instance_multiplier": round(cfg.instance_multiplier, 2),
        "ms": round(ms, 3),
        "iters": args.iters,
        "floor_ms": round(floor, 2),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
