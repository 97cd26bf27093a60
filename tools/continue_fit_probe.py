#!/usr/bin/env python
"""Continue-training probe: is the 2M fit budget-bound? Load the
committed trained_2m scene, train 1000 MORE steps (no densify, same
views), re-evaluate holdout. A meaningful rise pins the 21.9 dB on the
fixed 2000-step budget, not a capacity/coverage ceiling."""
import json, os, sys, time
import os
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "tools"))

def log(*a): print(*a, file=sys.stderr, flush=True)

import jax, jax.numpy as jnp, numpy as np
from gaussianrenderer_tpu.utils import enable_compilation_cache
enable_compilation_cache()
sys.argv.append("--tpu")
from make_trained_scene import orbit_cams
sys.argv.pop()
from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.render import _render_impl
from gaussianrenderer_tpu.scene.io import make_clustered_scene
from gaussianrenderer_tpu.scene.compact import load_compact
from gaussianrenderer_tpu import train

h, w = 480, 640
tcfg = RenderConfig(height=h, width=w, compositor="packed", sh_degree=2)
cfg = RenderConfig(height=h, width=w, compositor="diff", sh_degree=1)
target_scene = make_clustered_scene(2_600_000, seed=7, sh_degree=2).prepared()
cams = orbit_cams(20, h, w, k_sigma=tcfg.k_sigma)
import functools
tjit = jax.jit(functools.partial(_render_impl, cfg=tcfg))
views = []
t0 = time.time()
for i, cam in enumerate(cams):
    fb, _ = tjit(target_scene, cam)
    views.append((cam, jnp.asarray(fb)))
log(f"targets done {time.time()-t0:.0f}s")
train_views, heldout = views[:16], views[16:]

fitted = load_compact(os.path.join(_repo, "data", "trained_2m.gsz"))
params = train.SceneParams.from_scene(fitted)
m0 = train.evaluate(params, heldout, cfg)
log(f"start holdout psnr {m0['psnr']:.2f}")
t0 = time.time()
params, hist = train.fit_scene(
    train_views, cfg, params, steps=1000,
    densify_every=0, sh_warmup_every=0,
    log_fn=lambda s, l: log(f"step {s} loss {l:.5f} ({time.time()-t0:.0f}s)"),
    log_every=200,
)
m1 = train.evaluate(params, heldout, cfg)
row = dict(probe="continue_fit", scene="data/trained_2m.gsz",
           extra_steps=1000, start_holdout_psnr=round(m0["psnr"], 2),
           end_holdout_psnr=round(m1["psnr"], 2),
           end_holdout_ssim=round(m1["ssim"], 4),
           fit_s=round(time.time()-t0, 1))
log(json.dumps(row))
with open(os.path.join(_repo, "train_quality.jsonl"), "a") as f:
    f.write(json.dumps(row) + "\n")
print(json.dumps(row))
