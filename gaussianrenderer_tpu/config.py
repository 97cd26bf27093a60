"""Render configuration.

The reference scatters configuration across three ad-hoc mechanisms (compile
time constants in ``render.cuh:2-5``, per-harness CLI parsing, and the runtime
ImGui ``UiSettings`` in ``canvas.hpp:7-19``).  Here everything is consolidated
into one dataclass plus a small runtime-settings object, as planned in
SURVEY.md §5 ("config / flag system").

Static fields (shapes, tile grid, capacities) participate in jit cache keys;
runtime fields (k_sigma, fov) are traced arguments so UI changes never force a
recompile (reference behavior: ImGui sliders take effect on the next frame).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) configuration of the render pipeline.

    Mirrors the reference's ``TilingInformation`` (``gaussians.hpp:38-60``):
    a ``num_tile_x × num_tile_y`` grid over a ``width × height`` framebuffer
    with ceil-div pixel strides.  Extra fields are TPU-specific capacities
    that replace the reference's data-dependent mid-frame readbacks
    (``render.cu:925,963``) with static shapes + masking.
    """

    height: int = 800
    width: int = 800
    num_tile_x: int = 0  # 0 → auto: pick TPU-friendly tile strides
    num_tile_y: int = 0

    #: Spherical-harmonics degree for view-dependent color. The reference's
    #: live path evaluates degrees 0-2 (``render.cu:506-530``; its ``deg=3``
    #: flag has no degree-3 branch). We support 0-3.
    sh_degree: int = 2

    #: k-sigma radius used for the screen-space AABB (reference UI slider
    #: 0.1-8, ``canvas.cpp:311``). Runtime-traced; this is only the default.
    k_sigma: float = 3.0

    #: Static capacity for (gaussian, tile) instance pairs, as a multiple of
    #: the gaussian count. The reference sizes this buffer per-frame from a
    #: device readback (``render.cu:962-971``); on TPU the shape must be
    #: static, so instances beyond the capacity are dropped (and reported via
    #: the overflow flag in RenderStats).
    instance_multiplier: float = 8.0

    #: Hard cap on instance capacity (guards tiny-N configs from rounding).
    min_instance_capacity: int = 4096

    #: Chunk of sorted instances composited per inner step of the tile
    #: kernel (the MXU-matmul batch size).
    chunk_size: int = 128

    #: Chunk size for the PACKED Pallas compositor specifically. The packed
    #: kernel's cost model is chunks × (fixed ~0.9 µs + lanes × vector);
    #: 256 halves the fixed term vs 128 (measured −9% at the c4 shape,
    #: profile_r3.jsonl) at slightly coarser early-exit granularity.
    packed_chunk: int = 256

    #: Compositor backend: "packed" (Pallas kernel fed by the gather-free
    #: packed-instance pipeline — the fast path), "xla" (pure-XLA
    #: while_loop reference), or "diff" (fixed-trip scan,
    #: reverse-differentiable — used by training).
    compositor: str = "packed"

    #: Composite the frame over a background color (r, g, b in [0, 1])
    #: instead of the reference's implicit black. Standard for 3DGS
    #: training on white-background captures (the upstream rasterizer
    #: takes bg_color); applied OUTSIDE the compositors as
    #: rgb + T_final*bg using the accumulated-alpha channel, so every
    #: compositor (packed/xla/diff) supports it identically. Static:
    #: changing it recompiles (colors change rarely; keep it out of the
    #: traced camera params).
    background: "Optional[Tuple[float, float, float]]" = None

    #: Return a (4, H, W) framebuffer whose row 3 is the accumulated
    #: opacity per pixel (1 - final transmittance) — the alpha matte
    #: upstream 3DGS tooling expects. Off: the reference's (3, H, W).
    output_alpha: bool = False

    #: Append an expected-depth row to the framebuffer: per pixel
    #: sum(w_i * d_i) over the blend weights w_i = alpha_i*T_i and
    #: camera-space depths d_i (divide by the alpha row for the
    #: normalized depth map). Standard 3DGS tooling output for depth
    #: supervision/visualization; the reference has no depth output.
    #: Channel order: rgb, [alpha], [depth].
    output_depth: bool = False

    #: Static per-tile chunk bound for the differentiable compositor.
    diff_max_chunks: int = 32

    #: Use the Pallas forward+backward train kernel
    #: (ops/pallas/tile_train.py) for compositor="diff" when the tile
    #: shape allows (tile_w*tile_h % 1024 == 0) and no depth row is
    #: requested; otherwise (or when False) the lax.scan compositor
    #: runs. Same math, hand-written VJP, per-tile early termination and
    #: no diff_max_chunks truncation — measured ~8x faster train steps
    #: (PERF_NOTES.md round-3 training section).
    diff_kernel: bool = True

    #: Quantization factor for the depth sort key: ``uint32(-Z * depth_scale)``
    #: (reference ``render.cu:850``).
    depth_scale: float = 1.0e6

    #: Round splat centers to integer pixels like the reference
    #: (``render.cu:753-754``). Training configs set False so position
    #: gradients flow through the screen-space center.
    quantize_centers: bool = True

    #: EWA low-pass dilation added to the 2D covariance diagonal (px²).
    #: 0.0 matches the reference live path (it keeps the original 3DGS
    #: rasterizer's +0.3 commented out, reference ``render.cpp:239-242``);
    #: set 0.3 for upstream-3DGS compatibility — real captures were
    #: TRAINED with the dilation, so thin splats alias without it.
    ewa_dilation: float = 0.0

    #: Upstream 3DGS "antialiasing" mode (the official rasterizer's
    #: flag, after Mip-Splatting): scale opacity by
    #: ``sqrt(det(Σ)/det(Σ + dilation·I))`` so the low-pass dilation
    #: preserves splat energy instead of brightening sub-pixel splats
    #: (≈1 for large splats, →0 as the footprint shrinks below the
    #: filter). Only meaningful with ``ewa_dilation > 0``; scenes
    #: trained with antialiasing on must be rendered with it on.
    ewa_compensate: bool = False

    #: Tier-capacity boost (0-3) for the packed path's wide-splat tiers;
    #: each step quadruples them. ``make_renderer(auto_tier=True)`` bumps
    #: this automatically when a frame reports overflow.
    tier_boost: int = 0

    #: Explicit packed-path area ladder ((m, k), ...): every Gaussian gets
    #: m₀ instance lanes, the k widest get the wider tiers. None → an
    #: N-scaled default; ``make_renderer(auto_tier=True)`` calibrates this
    #: from the scene's area histogram.
    tiers: Optional[tuple] = None

    #: Frame-coherent saturation/overdraw culling (ops/satcull.py,
    #: packed path only): splats provably behind fully-saturated
    #: (T < 1e-3) 16×16 pixel blocks — per the PREVIOUS frame's
    #: saturation depths — are dropped before the frame sort, removing
    #: their sort lanes AND compositor pairs. Exact for a static camera
    #: from frame 2; under motion ``sat_margin`` (camera-depth units)
    #: absorbs saturation-front shifts and the ``sat_risk`` stat counts
    #: blocks where the coherence assumption broke (self-healing next
    #: frame). The per-frame cutoff state threads through
    #: ``render_frame``'s ``sat_state``/third return value
    #: (``make_renderer`` does this automatically).
    sat_cull: bool = False

    #: Conservative depth margin (camera units) added to every
    #: saturation cutoff before culling. Generalizes the reference's
    #: per-pixel early-exit (``render.cu:326-328``) across frames.
    sat_margin: float = 0.25

    #: Spatial erosion radius (16px blocks) of the cutoff image before
    #: culling: protects against saturation fronts sliding LATERALLY by
    #: up to this many blocks between frames (the depth margin only
    #: covers motion along the ray). 1 covers ~16 px/frame of screen
    #: motion; raise for faster cameras, 0 for static ones.
    sat_dilate: int = 1

    # ---------------------------------------------------------------- derived
    @property
    def tile_w(self) -> int:
        """Pixel width of one tile (reference ``width_stride``).

        Auto mode uses 32×32 tiles (the packed kernel writes per-tile (3, P)
        blocks, so any P = tile_w·tile_h that is a multiple of 128 works);
        an explicit tile grid uses the reference's ceil-div stride
        (``gaussians.hpp:47-50``), which may be incompatible — the renderer
        then falls back to the XLA compositor.
        """
        if self.num_tile_x > 0:
            return _cdiv(self.width, self.num_tile_x)
        return 32

    @property
    def tile_h(self) -> int:
        """Pixel height of one tile (reference ``height_stride``)."""
        if self.num_tile_y > 0:
            return _cdiv(self.height, self.num_tile_y)
        return 32

    @property
    def packed_compatible(self) -> bool:
        """The v2 packed kernel writes (3, tile_h·tile_w) blocks — any tile
        whose pixel count is lane-aligned and whose extents fit the u8
        tile-local AABB encoding works. The framebuffer is capped at
        4096 px per side so tile-local centers fit the 13.3 fixed-point
        row-0 encoding (±4096, ops/instances.py); larger outputs fall back
        to the XLA compositor rather than silently clamping centers."""
        return (
            (self.tile_w * self.tile_h) % 128 == 0
            and self.tile_w <= 255
            and self.tile_h <= 255
            and self.tiles_x <= 1024
            and self.tiles_y <= 1024
            and self.width <= 4096
            and self.height <= 4096
        )

    @property
    def tiles_x(self) -> int:
        if self.num_tile_x > 0:
            return self.num_tile_x
        return max(1, _cdiv(self.width, self.tile_w))

    @property
    def tiles_y(self) -> int:
        if self.num_tile_y > 0:
            return self.num_tile_y
        return max(1, _cdiv(self.height, self.tile_h))

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    def instance_capacity(self, num_gaussians: int) -> int:
        cap = int(math.ceil(num_gaussians * self.instance_multiplier))
        cap = max(cap, self.min_instance_capacity)
        # round to a multiple of chunk_size for clean kernel loops
        return _cdiv(cap, self.chunk_size) * self.chunk_size

    @staticmethod
    def auto_packed_chunk(sort_lanes: int) -> int:
        """Measured chunk-size rule for the packed compositor: 256
        amortizes the ~0.9 µs/chunk fixed cost at production lane counts
        (−9% at the c4 shape, profile_r3.jsonl); below ~1.5M lanes the
        last-chunk dense-block waste at low tile occupancy dominates
        instead and 128 wins (17.1 → 16.3 ms at the c7 trained-100k
        shape, profile_c7.jsonl). Session calibration
        (``make_renderer(auto_tier=True)``, bench_suite) applies this
        when ``packed_chunk`` is left at its default."""
        return 128 if sort_lanes < 1_500_000 else 256

    def with_resolution(self, height: int, width: int) -> "RenderConfig":
        """Dynamic-resize support (reference ``Canvas::onResize``,
        ``canvas.cpp:198-224``): returns a config for the new framebuffer;
        callers keep a small jit cache keyed by (H, W) buckets."""
        return dataclasses.replace(self, height=height, width=width)


@dataclasses.dataclass
class UiSettings:
    """Runtime-adjustable viewer settings.

    Parity with the reference ImGui ``UiSettings`` (``canvas.hpp:7-19``):
    flip-Y display toggle, k-sigma splat radius, fovY, tile-grid size with
    an X/Y lock. These are traced (k_sigma, fov) or cheap-recompile (tiles)
    parameters in the TPU design.
    """

    flip_y: bool = True
    k_sigma: float = 3.0
    fov_y: float = 45.0  # matches the Camera default (camera.py)
    num_tile_x: int = 0
    num_tile_y: int = 0
    lock_tiles: bool = True
    #: 4D scenes: the slice time (traced, so scrubbing never recompiles).
    #: None renders static (ignored when the scene has no time_params).
    time_value: Optional[float] = None
    #: Display mode: "rgb" or "depth" (normalized expected-depth map via
    #: cfg.output_depth). Toggling switches executables (first visit
    #: compiles; the persistent cache makes later visits instant).
    view_mode: str = "rgb"

    def clamp(self) -> None:
        self.k_sigma = min(max(self.k_sigma, 0.1), 8.0)
        self.fov_y = min(max(self.fov_y, 10.0), 160.0)
        if self.view_mode not in ("rgb", "depth"):
            self.view_mode = "rgb"
        if self.lock_tiles and self.num_tile_x > 0:
            self.num_tile_y = self.num_tile_x


def parse_color(spec: "Optional[str]") -> "Optional[Tuple[float, float, float]]":
    """CLI color spec → RenderConfig.background value.

    Accepts ``"white"``, ``"black"``, or ``"r,g,b"`` floats in [0, 1];
    None passes through (no background compositing). Shared by the
    ``gr-fit`` / ``gr-eval`` / ``gr-render`` ``--background`` flags.
    """
    if spec is None:
        return None
    named = {"white": (1.0, 1.0, 1.0), "black": (0.0, 0.0, 0.0)}
    if spec.lower() in named:
        return named[spec.lower()]
    parts = [float(p) for p in spec.split(",")]
    if len(parts) != 3 or not all(0.0 <= p <= 1.0 for p in parts):
        raise ValueError(
            f"background {spec!r}: expected 'white', 'black', or r,g,b "
            "floats in [0, 1]"
        )
    return tuple(parts)
