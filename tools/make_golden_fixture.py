#!/usr/bin/env python
"""Generate the pinned golden-image fixture (tests/fixtures/golden_*).

The PSNR gates compare the pipeline against ``oracle.render_oracle`` —
the repo's own NumPy port of the reference math (the reference ships no
golden images, SURVEY §4). That evidence is self-referential: if the
oracle drifts, the gates drift with it. This script renders ONE small
deterministic scene with the oracle and commits the result in two forms:

  golden_scene0.npz  — exact f32 framebuffer (drift detection: the
                       current oracle must reproduce it to ~1 ULP)
  golden_scene0.png  — 8-bit image for human inspection in review

tests/test_render_vs_oracle.py::test_pinned_golden_image re-renders the
same scene with the current oracle (near-exact match required) AND the
packed TPU pipeline (≥40 dB, the BASELINE fidelity bar) against the
committed array, so a change to either side becomes visible in CI.

Regenerating (ONLY when an intentional numerics change is made —
commit the new fixture together with the change that explains it):
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


def golden_setup():
    """The pinned scene/camera/config (shared with the test)."""
    scene = make_random_scene(800, seed=123)
    cam = Camera()
    cam.set_position([0.5, -0.4, 5.5])
    cam.set_look_at([0.0, 0.0, 0.0])
    cam.set_fov_y(55.0)
    cam.set_aspect_ratio(160 / 128)
    cam.set_clipping_planes(0.2, 100.0)
    cam.update_camera_matrices()
    cfg = RenderConfig(height=128, width=160, compositor="packed")
    return scene, cam, cfg


def main():
    scene, cam, cfg = golden_setup()
    fb = render_oracle(scene, cam, cfg)  # (3, H, W) f32
    fix_dir = os.path.join(REPO, "tests", "fixtures")
    os.makedirs(fix_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(fix_dir, "golden_scene0.npz"), framebuffer=fb
    )
    from PIL import Image

    Image.fromarray(framebuffer_to_image(fb)).save(
        os.path.join(fix_dir, "golden_scene0.png")
    )
    print(
        f"wrote golden_scene0.npz/png  shape={fb.shape} "
        f"mean={fb.mean():.5f} max={fb.max():.5f}"
    )


if __name__ == "__main__":
    main()
