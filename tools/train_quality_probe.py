#!/usr/bin/env python
"""Train-vs-holdout quality decomposition of a fitted scene (VERDICT r4
#6: diagnose the 2M fit's 21.9 dB holdout vs 26.5 at 500k).

Regenerates the exact target views of tools/make_trained_scene.py
(clustered target scene, seed 7, same orbit cameras) and reports the
fitted scene's PSNR per TRAIN view and per HOLDOUT view. The committed
recipe rows already hint at the cause — the 2M fit's final TRAIN loss
is 5.5× LOWER than the 500k fit's (0.0020 vs 0.0110) while its holdout
PSNR is 4.5 dB WORSE — i.e. classic overfit/view-coverage limitation
(2M splats ≈ 118M parameters against 16 × 307k-px training views);
this probe turns that hint into a measured train/holdout gap.

  PYTHONPATH=... python tools/train_quality_probe.py \
      --scene data/trained_2m.gsz --n-target 2600000 [--views 16 ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/trained_2m.gsz")
    ap.add_argument("--n-target", type=int, default=2_600_000)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--holdout", type=int, default=4)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--sh-degree", type=int, default=1)
    ap.add_argument("--out", default="train_quality.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussianrenderer_tpu.utils import (
        JsonlWriter,
        enable_compilation_cache,
    )

    enable_compilation_cache()

    # NOTE: import make_trained_scene ONLY via this guard — its module
    # top-level forces the CPU backend when "--tpu" is absent from
    # sys.argv (it cost one probe run 30 CPU-minutes of 2.6M-splat
    # CPU rendering before this was caught).
    sys.argv.append("--tpu")
    from make_trained_scene import orbit_cams
    sys.argv.pop()
    from gaussianrenderer_tpu.config import RenderConfig
    from gaussianrenderer_tpu.render import _render_impl
    from gaussianrenderer_tpu.scene.io import load_scene, make_clustered_scene

    h, w = args.height, args.width
    tcfg = RenderConfig(height=h, width=w, compositor="packed", sh_degree=2)
    fcfg = RenderConfig(
        height=h, width=w, compositor="packed", sh_degree=args.sh_degree
    )
    target_scene = make_clustered_scene(
        args.n_target, seed=7, sh_degree=2
    ).prepared()
    fitted = load_scene(args.scene).prepared()
    log(f"fitted scene: {fitted.num_gaussians} splats from {args.scene}")

    n_all = args.views + args.holdout
    cams = orbit_cams(n_all, h, w, k_sigma=tcfg.k_sigma)

    import functools

    tjit = jax.jit(functools.partial(_render_impl, cfg=tcfg))
    fjit = jax.jit(functools.partial(_render_impl, cfg=fcfg))

    @jax.jit
    def mse(a, b):
        return jnp.mean((a - b) ** 2)

    rows = []
    t0 = time.time()
    for i, cam in enumerate(cams):
        tgt, _ = tjit(target_scene, cam)
        fb, _ = fjit(fitted, cam)
        m = float(mse(fb, tgt))
        psnr = 10 * np.log10(1.0 / m) if m > 0 else 120.0
        split = "train" if i < args.views else "holdout"
        rows.append((split, i, psnr))
        log(f"view {i:2d} [{split}] psnr {psnr:.2f} ({time.time()-t0:.0f}s)")

    tr = [p for s, _, p in rows if s == "train"]
    ho = [p for s, _, p in rows if s == "holdout"]
    summary = dict(
        scene=args.scene,
        n_fit=fitted.num_gaussians,
        n_target=args.n_target,
        views=args.views,
        holdout=args.holdout,
        resolution=f"{w}x{h}",
        train_psnr_mean=round(float(np.mean(tr)), 2),
        train_psnr_min=round(float(np.min(tr)), 2),
        holdout_psnr_mean=round(float(np.mean(ho)), 2),
        holdout_psnr_min=round(float(np.min(ho)), 2),
        gap_db=round(float(np.mean(tr) - np.mean(ho)), 2),
        per_view=[(s, i, round(p, 2)) for s, i, p in rows],
    )
    JsonlWriter(args.out).write(**summary)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
