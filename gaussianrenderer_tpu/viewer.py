"""Canvas — the viewer/session layer (reference ``render/canvas.*`` parity).

The reference Canvas owns a GLFW window, per-frame CUDA orchestration, an
ImGui settings panel, and input callbacks (``canvas.cpp``). TPU hosts have
no GPU/OpenGL, so this Canvas is a **headless session object** with the
same public surface and behavior envelope:

* construction ``Canvas(height, width, tile_x, tile_y)`` (``canvas.cpp:9``)
* ``init()`` — builds the (jit-cached) renderer instead of GL objects
* ``load_gaussians(path)`` — hot scene swap (drag-drop analog,
  ``canvas.cpp:280-296``)
* ``render()`` — one frame through the full TPU pipeline; ``draw()`` —
  fetch + convert the framebuffer for display (the reference's D2H →
  SSBO → fullscreen-quad hop, ``canvas.cpp:337-365``)
* ``on_resize(h, w)`` — dynamic resolution (``canvas.cpp:198-224``): camera
  aspect + tile strides recomputed; jit cache keyed per (H, W) bucket
* ``UiSettings`` — flip-Y, k-sigma (0.1-8), fovY, tile grid with X/Y lock
  (``canvas.hpp:7-19``, ``canvas.cpp:298-335``); k-sigma and fov are traced
  args so moving a slider never recompiles
* orbit / zoom / drag input helpers with the reference's deg-per-pixel
  speeds (``canvas.cpp:226-279``)
* an EMA frame timer matching ``cull_sort_test.cpp:53-63``

For an actual on-screen view, ``serve()`` starts a localhost MJPEG/HTML
viewer (see web_viewer.py) — the display transport replacing OpenGL.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gaussianrenderer_tpu.config import RenderConfig, UiSettings
from gaussianrenderer_tpu.render import framebuffer_to_image, render_frame
from gaussianrenderer_tpu.scene.camera import Camera
from gaussianrenderer_tpu.scene.gaussians import GaussianScene
from gaussianrenderer_tpu.scene.io import load_scene
from gaussianrenderer_tpu.utils.timing import FrameTimer

__all__ = ["Canvas", "FrameTimer", "OrbitControls"]


class OrbitControls:
    """Drag-to-orbit state (reference ``render.hpp:11-20``)."""

    def __init__(self, orbit_speed_x: float = 0.25, orbit_speed_y: float = 0.25):
        self.orbit_speed_x = orbit_speed_x  # degrees per pixel
        self.orbit_speed_y = orbit_speed_y
        self.dragging = False
        self._last_xy = (0.0, 0.0)

    def press(self, x: float, y: float) -> None:
        self.dragging = True
        self._last_xy = (x, y)

    def release(self) -> None:
        self.dragging = False

    def move(self, x: float, y: float):
        """Returns (azimuth_deg, elevation_deg) or None if not dragging."""
        if not self.dragging:
            return None
        dx = x - self._last_xy[0]
        dy = y - self._last_xy[1]
        self._last_xy = (x, y)
        return (dx * self.orbit_speed_x, dy * self.orbit_speed_y)


class Canvas:
    """Headless render session with the reference Canvas surface."""

    def __init__(
        self,
        height: int = 800,
        width: int = 800,
        tile_x: int = 0,
        tile_y: int = 0,
        compositor: str = "packed",
        **cfg_kwargs,
    ):
        self.settings = UiSettings()
        # Extra RenderConfig fields pass straight through (ewa_dilation,
        # ewa_compensate, background, output_depth, …) — the session owns
        # resolution/tiling/fov; everything else is the config's.
        self._base_cfg = RenderConfig(
            height=height,
            width=width,
            num_tile_x=tile_x,
            num_tile_y=tile_y,
            compositor=compositor,
            **cfg_kwargs,
        )
        self.camera = Camera()
        # Keep the UI fov in sync with the camera default (45°) — otherwise
        # the first set_fov() call would jump the view (ADVICE r1).
        self.settings.fov_y = self.camera.fov_y
        self._scene: Optional[GaussianScene] = None
        self._prepared = None  # render-layout cache (scene.prepared())
        self.timer = FrameTimer()
        self.controls = OrbitControls()
        self._fb = None
        self._last_drop: Optional[str] = None
        self._initialized = False

    # ------------------------------------------------------------- lifecycle
    def init(self, prewarm: bool = True, resize_buckets=((720, 1280),)) -> None:
        """Reference ``Canvas::init`` — enables the persistent compilation
        cache (so warm sessions skip the first-frame compile) in place of
        the reference's GL object allocation.

        ``prewarm``: once a scene is loaded, a background daemon thread
        AOT-compiles the current resolution plus every ``(h, w)`` in
        ``resize_buckets`` — populating both the in-memory and persistent
        caches so the first render/resize of those buckets pays a cache
        load instead of the full XLA compile (the reference resizes
        instantly, ``canvas.cpp:198-224``; measured compile split in
        tools/compile_profile.py)."""
        from gaussianrenderer_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        self._prewarm_enabled = bool(prewarm)
        self._prewarm_buckets = tuple(resize_buckets or ())
        self._initialized = True
        if self._prepared is not None and self._prewarm_enabled:
            self._start_prewarm()

    def _start_prewarm(self) -> None:
        """Best-effort background compile of the session's (H, W) buckets.

        Hot-swap safe: each call bumps a generation counter; the worker
        re-reads the CURRENT scene/config after finishing a pass, so a
        scene loaded while a prewarm is in flight still gets its buckets
        compiled (by the already-running thread) instead of being
        skipped."""
        import threading

        self._prewarm_generation = getattr(self, "_prewarm_generation", 0) + 1
        t = getattr(self, "_prewarm_thread", None)
        if t is not None and t.is_alive():
            return  # the live worker picks up the new generation

        def work():
            from gaussianrenderer_tpu.render import _render_frame_static

            while True:
                gen = self._prewarm_generation
                scene = self._prepared
                if scene is not None:
                    cfgs = [self.cfg] + [
                        self.cfg.with_resolution(h, w)
                        for h, w in self._prewarm_buckets
                    ]
                    params = self.camera.params(self.settings.k_sigma)
                    for c in cfgs:
                        try:
                            # AOT lower+compile: populates the persistent
                            # cache keyed by HLO, so the live render of
                            # this bucket (same scene shapes + static
                            # cfg) loads from disk.
                            _render_frame_static.lower(
                                scene, params, c
                            ).compile()
                        except Exception:
                            pass  # prewarm must never break the session
                if self._prewarm_generation == gen:
                    return  # no load_gaussians arrived mid-pass

        th = threading.Thread(target=work, daemon=True, name="gr-prewarm")
        th.start()
        self._prewarm_thread = th

    @property
    def cfg(self) -> RenderConfig:
        import dataclasses

        s = self.settings
        cfg = self._base_cfg
        if s.num_tile_x > 0 or s.num_tile_y > 0:
            cfg = dataclasses.replace(
                cfg, num_tile_x=s.num_tile_x, num_tile_y=s.num_tile_y
            )
        if s.view_mode == "depth":
            # The depth display needs the alpha row for normalization.
            cfg = dataclasses.replace(
                cfg, output_alpha=True, output_depth=True
            )
        return cfg

    # --------------------------------------------------------------- loading
    @property
    def scene(self) -> Optional[GaussianScene]:
        """The loaded scene (host/row-major form). Assigning refreshes the
        device-resident render-layout cache — rendering always uses the
        prepared copy, and only ONE device copy stays resident (the raw
        scene is kept un-transferred; a 3M-splat SH block alone is
        hundreds of MB of HBM)."""
        return self._scene

    @scene.setter
    def scene(self, scene: Optional[GaussianScene]) -> None:
        self._scene = scene
        self._prepared = None if scene is None else scene.prepared()
        if (
            self._prepared is not None
            and self._initialized
            and getattr(self, "_prewarm_enabled", False)
        ):
            self._start_prewarm()

    def load_gaussians(self, path: str) -> None:
        """Hot-swap the scene (reference drag-drop, ``canvas.cpp:280-296``).

        If a calibration sidecar exists for (this file, this config
        bucket) — written by an earlier auto_tier session or probe —
        its ladder seeds the config, so the session's first compile is
        already the calibrated executable (scene/calibration.py)."""
        self.scene = load_scene(path)  # PLY or .gsz, by extension
        if self._base_cfg.compositor == "packed":
            import dataclasses

            from gaussianrenderer_tpu.scene.calibration import (
                load_calibration,
            )

            entry = load_calibration(path, self.cfg)
            if entry and entry.get("tiers"):
                self._base_cfg = dataclasses.replace(
                    self._base_cfg, tiers=entry["tiers"]
                )
                if entry.get("packed_chunk"):
                    # Executable identity includes the chunk — seeding
                    # only the ladder would compile a different program
                    # than the one the writing session cached.
                    self._base_cfg = dataclasses.replace(
                        self._base_cfg,
                        packed_chunk=int(entry["packed_chunk"]),
                    )

    def set_scene(self, scene: GaussianScene) -> None:
        self.scene = scene

    def drop_file(self, path: str) -> None:
        """GLFW drop-callback analog: remembers and loads the last path."""
        self._last_drop = path
        self.load_gaussians(path)

    # --------------------------------------------------------------- controls
    def on_cursor(self, x: float, y: float) -> None:
        delta = self.controls.move(x, y)
        if delta is not None:
            self.camera.orbit(*delta)

    def on_mouse_button(self, pressed: bool, x: float = 0.0, y: float = 0.0) -> None:
        if pressed:
            self.controls.press(x, y)
        else:
            self.controls.release()

    def on_scroll(self, dy: float) -> None:
        self.camera.zoom(dy)

    def on_resize(self, height: int, width: int) -> None:
        """Dynamic resolution (reference ``Canvas::onResize``): updates the
        camera aspect and switches to the (H, W) jit bucket."""
        self._base_cfg = self._base_cfg.with_resolution(height, width)
        self.camera.set_aspect_ratio(width / height)
        self.camera.update_camera_matrices()

    def set_fov(self, fov_deg: float) -> None:
        self.settings.fov_y = fov_deg
        self.settings.clamp()
        self.camera.set_fov_y(self.settings.fov_y)
        self.camera.update_camera_matrices()
        self.camera.update_frustum_planes()  # fov slider path, canvas.cpp:310-314

    # ---------------------------------------------------------------- render
    def render(self):
        """One frame: the reference's ``preprocessCUDAGaussians`` analog.

        Returns (framebuffer, stats); the framebuffer stays on device.
        """
        if self.scene is None:
            raise RuntimeError("no scene loaded — call load_gaussians() first")
        self.settings.clamp()
        cfg = self.cfg
        params = self.camera.params(self.settings.k_sigma)
        tv = self.settings.time_value
        if tv is not None and self._prepared.time_params is not None:
            # 4D scene scrub: time is traced, so the slider never recompiles.
            fb, stats = render_frame(
                self._prepared, params, cfg, jnp.float32(tv)
            )
        else:
            fb, stats = render_frame(self._prepared, params, cfg)
        self._fb = fb
        line = self.timer.tick()
        if line:
            print(line, flush=True)
        return fb, stats

    def draw(self, fb=None) -> np.ndarray:
        """Fetch the frame for display: (H, W, 3) uint8, Y-flip per settings
        (the reference's D2H + SSBO + fragment-shader flip). In depth view
        mode the expected-depth row is alpha-normalized and min-max scaled
        to a grayscale image (uncovered pixels black).

        ``fb`` overrides the framebuffer to fetch — the /stream pusher
        passes the PREVIOUS frame so its D2H overlaps the next frame's
        device execution (web_viewer._stream)."""
        if fb is None:
            if self._fb is None:
                self.render()
            fb = self._fb
        if self.settings.view_mode == "depth" and fb.shape[0] >= 5:
            fb = np.asarray(fb)
            alpha, depth = fb[3], fb[4]
            covered = alpha > 0.05
            nd = np.where(covered, depth / np.maximum(alpha, 1e-6), 0.0)
            vis = nd[covered]
            lo = float(vis.min()) if vis.size else 0.0
            hi = float(vis.max()) if vis.size else 1.0
            gray = np.where(
                covered, (nd - lo) / max(hi - lo, 1e-6), 0.0
            ).astype(np.float32)
            fb = np.broadcast_to(gray[None], (3,) + gray.shape)
        # rgb display of a config with extra output rows (output_alpha /
        # output_depth on the base cfg): show the color rows only.
        return framebuffer_to_image(fb[:3], flip_y=self.settings.flip_y)

    def screenshot(self, path: str) -> None:
        """Save the current frame (rendering one if needed) as a PNG —
        the headless stand-in for eyeballing the reference's GL window."""
        from gaussianrenderer_tpu.render import save_png

        save_png(self.draw(), path, flip_y=False)  # draw() already flipped

    # ------------------------------------------------------------------ loop
    def run_headless(self, frames: int, orbit_deg_per_frame: float = 1.0):
        """Reference main loop analog (``cull_sort_test.cpp:52-64``): orbit,
        render, EMA-report. Returns the last frame as uint8."""
        for _ in range(frames):
            self.camera.orbit(orbit_deg_per_frame, 0.0)
            self.render()
        return self.draw()

    def serve(self, host: str = "127.0.0.1", port: int = 8800):
        """Start the browser viewer (display transport; see web_viewer.py)."""
        from gaussianrenderer_tpu.web_viewer import serve_canvas

        serve_canvas(self, host=host, port=port)
