#!/usr/bin/env python
"""Generate the pinned golden-image fixtures (tests/fixtures/golden_*).

The PSNR gates compare the pipeline against ``oracle.render_oracle`` —
the repo's own NumPy port of the reference math (the reference ships no
golden images, SURVEY §4). That evidence is self-referential: if the
oracle drifts, the gates drift with it. This script renders a SET of
small deterministic scenes with the oracle and commits each result in
two forms:

  golden_<name>.npz  — exact f32 framebuffer (drift detection: the
                       current oracle must reproduce it to ~1 ULP)
  golden_<name>.png  — 8-bit image for human inspection in review

The set covers the numerics paths a single scene cannot (VERDICT r3
weak #5: "degree-3, 4D-motion, antialias, and trained-scene goldens are
not pinned"):

  scene0    — SH degree-2 uniform random scene (the round-3 golden)
  deg3      — SH degree-3 color path (all four bands)
  motion    — 4D spacetime scene sliced MID-MOTION (t=0.37: per-splat
              velocity position slicing + temporal opacity)
  ewa       — ewa_dilation=0.3 + ewa_compensate=True (upstream
              antialiasing mode)
  trained   — tests/fixtures/trained.ply (a scene actually fit by the
              TPU trainer; heavy-tailed trained statistics)

tests/test_render_vs_oracle.py::test_pinned_golden_images re-renders
every scene with the current oracle (near-exact match required) AND the
packed TPU pipeline (≥40 dB, the BASELINE fidelity bar) against the
committed arrays, so a change to either side becomes visible in CI.

Regenerating (ONLY when an intentional numerics change is made —
commit the new fixtures together with the change that explains it):
    python tools/make_golden_fixture.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gaussianrenderer_tpu.config import RenderConfig  # noqa: E402
from gaussianrenderer_tpu.oracle import render_oracle  # noqa: E402
from gaussianrenderer_tpu.render import framebuffer_to_image  # noqa: E402
from gaussianrenderer_tpu.scene.camera import Camera  # noqa: E402
from gaussianrenderer_tpu.scene.io import make_random_scene  # noqa: E402


def _camera(aspect):
    cam = Camera()
    cam.set_position([0.5, -0.4, 5.5])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(55.0)
    cam.set_aspect_ratio(aspect)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    return cam


def golden_setup(name: str = "scene0"):
    """The pinned (scene, camera, cfg, time) per golden — shared with
    the test. Scenes are tiny and fully deterministic."""
    if name == "scene0":
        scene = make_random_scene(800, seed=123)
        cfg = RenderConfig(height=128, width=160, compositor="packed")
        return scene, _camera(160 / 128), cfg, None
    if name == "deg3":
        scene = make_random_scene(600, seed=7, sh_degree=3)
        cfg = RenderConfig(
            height=128, width=160, compositor="packed", sh_degree=3
        )
        return scene, _camera(160 / 128), cfg, None
    if name == "motion":
        scene = make_random_scene(500, seed=9, spacetime=True)
        cfg = RenderConfig(height=128, width=160, compositor="packed")
        return scene, _camera(160 / 128), cfg, 0.37
    if name == "ewa":
        scene = make_random_scene(
            600, seed=5, scale_range=(0.004, 0.08)
        )
        cfg = RenderConfig(
            height=128, width=160, compositor="packed",
            ewa_dilation=0.3, ewa_compensate=True,
        )
        return scene, _camera(160 / 128), cfg, None
    if name == "trained":
        from gaussianrenderer_tpu.scene.io import load_ply

        scene = load_ply(
            os.path.join(REPO, "tests", "fixtures", "trained.ply"),
            max_sh_degree=1,
        )
        cfg = RenderConfig(
            height=128, width=160, compositor="packed", sh_degree=1,
            tier_boost=1,
        )
        cam = Camera()
        cam.set_position([3.9, 1.5, 3.9])
        cam.set_look_at([0.0, 0.0, 0.0])
        cam.set_fov_y(70.0)
        cam.set_aspect_ratio(160 / 128)
        cam.set_clipping_planes(0.2, 100.0)
        cam.update_camera_matrices()
        return scene, cam, cfg, None
    raise ValueError(f"unknown golden {name!r}")


GOLDEN_NAMES = ("scene0", "deg3", "motion", "ewa", "trained")


def main():
    fix_dir = os.path.join(REPO, "tests", "fixtures")
    os.makedirs(fix_dir, exist_ok=True)
    for name in GOLDEN_NAMES:
        scene, cam, cfg, tv = golden_setup(name)
        fb = render_oracle(scene, cam, cfg, time_value=tv)  # (3, H, W)
        np.savez_compressed(
            os.path.join(fix_dir, f"golden_{name}.npz"), framebuffer=fb
        )
        from PIL import Image

        Image.fromarray(framebuffer_to_image(fb)).save(
            os.path.join(fix_dir, f"golden_{name}.png")
        )
        print(
            f"wrote golden_{name}.npz/png  shape={fb.shape} "
            f"mean={fb.mean():.5f} max={fb.max():.5f}"
        )


if __name__ == "__main__":
    main()
