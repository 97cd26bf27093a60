"""The jit-compiled functional render step.

Replaces the reference's per-frame imperative orchestrator
``preprocessCUDAGaussians`` (``src/core/cuda/render.cu:871-1157``) — seven
kernel launches, per-frame cudaMalloc/cudaFree churn, and three host↔device
sync points — with one traced function::

    framebuffer, stats = render_frame(scene, camera_params, cfg)

Pipeline (all static shapes, no mid-frame readbacks):

1. ``preprocess_gaussians``   — cull + SH color + EWA projection (ops/projection)
2. ``build_features``         — pack per-splat render fields into (N, 16)
3. ``build_sorted_instances`` — tile expansion + (tile, depth) sort (ops/tiling)
4. ``composite_tiles_*``      — per-tile front-to-back blending
                                (Pallas kernel, or the XLA reference path)

The framebuffer stays on device; only display needs a transfer (the
reference copies D2H every frame, ``render.cu:1142``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.ops.compositing import (
    build_features,
    composite_tiles_diff,
    composite_tiles_xla,
    gather_sorted_features,
)
from gaussianrenderer_tpu.ops.projection import (
    preprocess_gaussians,
    slice_spacetime,
)
from gaussianrenderer_tpu.ops.tiling import build_sorted_instances
from gaussianrenderer_tpu.scene.camera import CameraParams
from gaussianrenderer_tpu.scene.gaussians import GaussianScene


class RenderStats(NamedTuple):
    """Per-frame diagnostics (device scalars; fetch lazily)."""

    num_culled: jnp.ndarray  # () int32 — Gaussians surviving the cull
    num_instances: jnp.ndarray  # () int32 — (gaussian, tile) pairs emitted
    overflow: jnp.ndarray  # () bool — instance capacity exceeded
    #: (len(AREA_BUCKETS)+1,) int32 tile-area histogram (packed path only;
    #: None otherwise) — feeds the auto_tier calibrator.
    area_hist: Optional[jnp.ndarray] = None
    #: () bool (packed path only) — a tile-local center saturated the 13.3
    #: fixed-point encode; affected splats render with a clamped center.
    center_clipped: Optional[jnp.ndarray] = None
    #: () int32 (sat_cull only) — splats dropped by the saturation cull
    #: this frame (ops/satcull.py).
    sat_culled: Optional[jnp.ndarray] = None
    #: () int32 (sat_cull only) — 16×16 blocks that were saturated last
    #: frame (so culling was active there) but did NOT saturate this
    #: frame: the disocclusion signal that frame coherence may have
    #: clipped content this frame. Such blocks publish no cutoff for the
    #: next frame (self-healing). Never silent, per the truncation rule.
    sat_risk: Optional[jnp.ndarray] = None


def _render_impl(
    scene: GaussianScene,
    cam: CameraParams,
    cfg: RenderConfig,
    time_value: Optional[jnp.ndarray] = None,
    ndc_probe: Optional[jnp.ndarray] = None,
    sat_state: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, RenderStats]:
    # 4D spacetime Gaussians: time-conditioned opacity AND position slicing
    # before projection (reference roadmap README.md:16; BASELINE config 5).
    scene, extra_opacity = slice_spacetime(scene, time_value)

    proj = preprocess_gaussians(
        scene,
        cam,
        width=cfg.width,
        height=cfg.height,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        tiles_x=cfg.tiles_x,
        tiles_y=cfg.tiles_y,
        sh_degree=cfg.sh_degree,
        extra_opacity_scale=extra_opacity,
        quantize_centers=cfg.quantize_centers,
        ewa_dilation=cfg.ewa_dilation,
        ewa_compensate=cfg.ewa_compensate,
        ndc_probe=ndc_probe,
    )

    capacity = cfg.instance_capacity(scene.num_gaussians)
    # Alpha is needed when the caller wants the matte OR a background
    # composite (rgb + T_final*bg happens here, outside the compositors,
    # so packed/xla/diff all support cfg.background identically).
    want_alpha = cfg.output_alpha or cfg.background is not None
    want_depth = cfg.output_depth

    if cfg.compositor == "packed" and cfg.packed_compatible:
        # Fast path: gather-free packed expansion + single-key sort + v2
        # Pallas kernel (see ops/instances.py, ops/pallas/tile_render2.py).
        from gaussianrenderer_tpu.ops.instances import build_packed_instances
        from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
            composite_tiles_packed,
        )

        with_sat = cfg.sat_cull and sat_state is not None
        sat_culled = None
        if with_sat:
            # Frame-coherent saturation cull (ops/satcull.py): drop
            # splats provably behind last frame's T<1e-3 fronts BEFORE
            # emission, so their lanes never reach the area/frame sorts
            # or the compositor. Conservative + flagged, never silent.
            from gaussianrenderer_tpu.ops import satcull

            sy, sx = satcull.sat_grid(
                cfg.tiles_x, cfg.tiles_y, cfg.tile_w, cfg.tile_h
            )
            depth_bits = min(
                32 - max(int(cfg.num_tiles).bit_length(), 1), 24
            )
            step = (jnp.float32(cam.far) - jnp.float32(cam.near)) / float(
                (1 << depth_bits) - 1
            )
            sat_eff = satcull.dilate_cutoff(sat_state, cfg.sat_dilate)
            culled = satcull.cull_mask(
                proj.valid,
                proj.depth,
                proj.aabb_px,
                satcull.build_pyramid(sat_eff),
                sx=sx,
                sy=sy,
                margin=cfg.sat_margin,
                depth_step=step,
            )
            sat_culled = jnp.sum(culled.astype(jnp.int32))
            proj = proj._replace(valid=proj.valid & ~culled)
            # Per-POSITION cull (tile-granular): instances of surviving
            # splats that land behind a fully-saturated tile stop
            # consuming lanes inside emission (satcull.tile_cutoff_q).
            sat_cut_q = satcull.tile_cutoff_q(
                sat_eff,
                tiles_x=cfg.tiles_x,
                tiles_y=cfg.tiles_y,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
                near=cam.near,
                depth_step=step,
                margin=cfg.sat_margin,
            )
        else:
            sat_cut_q = None

        inst = build_packed_instances(
            proj,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            capacity=capacity,
            near=cam.near,
            far=cam.far,
            tier_boost=cfg.tier_boost,
            tiers=cfg.tiers,
            want_depth=want_depth or with_sat,
            sat_cut_q=sat_cut_q,
        )
        fb = composite_tiles_packed(
            inst.packed_feats,
            inst.tile_start,
            inst.tile_count,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            width=cfg.width,
            height=cfg.height,
            chunk=cfg.packed_chunk,
            out_alpha=want_alpha,
            depth_row=inst.depth_f32 if want_depth else None,
            with_sat=with_sat,
        )
        sat_risk = None
        new_cutoff = None
        if with_sat:
            fb, sat_idx = fb
            new_cutoff = satcull.cutoff_from_sat(
                sat_idx,
                inst.depth_f32,
                tiles_x=cfg.tiles_x,
                tiles_y=cfg.tiles_y,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
            )
            # Disocclusion honesty: blocks that were culling (cutoff
            # present) but failed to re-saturate. They publish SAT_NONE
            # in new_cutoff, so the next frame self-heals.
            sat_risk = jnp.sum(
                (
                    (sat_state < satcull.SAT_NONE)
                    & (new_cutoff >= satcull.SAT_NONE)
                ).astype(jnp.int32)
            )
        fb = _finish_fb(fb, cfg)
        stats = RenderStats(
            num_culled=jnp.sum(proj.valid.astype(jnp.int32)),
            num_instances=inst.total_instances,
            overflow=inst.overflow,
            area_hist=inst.area_hist,
            center_clipped=inst.center_clipped,
            sat_culled=sat_culled,
            sat_risk=sat_risk,
        )
        if with_sat:
            return fb, stats, new_cutoff
        return fb, stats

    assignment = build_sorted_instances(
        proj,
        tiles_x=cfg.tiles_x,
        num_tiles=cfg.num_tiles,
        capacity=capacity,
        depth_scale=cfg.depth_scale,
        near=cam.near,
        far=cam.far,
    )

    feats = build_features(proj)
    if cfg.compositor == "diff":
        # Training path: the gather whose gradient transpose is the
        # sort+cumsum segment sum instead of XLA's scalar-bound
        # scatter-add (gather_sorted_features_seg docstring).
        from gaussianrenderer_tpu.ops.compositing import (
            gather_sorted_features_seg,
        )

        sorted_feats = gather_sorted_features_seg(
            feats, assignment, cfg.chunk_size, proj, capacity,
            cfg.num_tiles,
        )
    else:
        sorted_feats = gather_sorted_features(
            feats, assignment, cfg.chunk_size
        )

    if cfg.compositor == "diff":
        from gaussianrenderer_tpu.ops.pallas.tile_train import (
            composite_tiles_train,
            train_kernel_compatible,
        )

        if (
            cfg.diff_kernel
            and train_kernel_compatible(cfg.tile_w, cfg.tile_h)
            and not want_depth
        ):
            # Pallas forward + hand-written backward (custom_vjp): the
            # same chunk math with per-tile early termination and no
            # diff_max_chunks truncation — the training hot path.
            fb = composite_tiles_train(
                sorted_feats,
                assignment.tile_start,
                assignment.tile_count,
                tiles_x=cfg.tiles_x,
                tiles_y=cfg.tiles_y,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
                width=cfg.width,
                height=cfg.height,
                chunk_size=cfg.chunk_size,
                return_alpha=want_alpha,
            )
        else:
            fb = composite_tiles_diff(
                sorted_feats,
                assignment.tile_start,
                assignment.tile_count,
                tiles_x=cfg.tiles_x,
                tiles_y=cfg.tiles_y,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
                width=cfg.width,
                height=cfg.height,
                chunk_size=cfg.chunk_size,
                max_chunks=cfg.diff_max_chunks,
                return_alpha=want_alpha,
                return_depth=want_depth,
            )
    else:
        if cfg.compositor not in ("xla", "packed"):
            raise ValueError(
                f"unknown compositor {cfg.compositor!r}; "
                "expected 'packed', 'xla', or 'diff'"
            )
        # "packed" lands here only when the tile grid is not
        # packed_compatible — the XLA compositor is the documented fallback.
        fb = composite_tiles_xla(
            sorted_feats,
            assignment.tile_start,
            assignment.tile_count,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            width=cfg.width,
            height=cfg.height,
            chunk_size=cfg.chunk_size,
            return_alpha=want_alpha,
            return_depth=want_depth,
        )

    fb = _finish_fb(fb, cfg)
    stats = RenderStats(
        num_culled=jnp.sum(proj.valid.astype(jnp.int32)),
        num_instances=assignment.total_instances,
        overflow=assignment.overflow,
    )
    return fb, stats


def _finish_fb(fb: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """Background composite + output-channel selection.

    ``fb`` rows arrive as [rgb(3)] [alpha (when requested)] [depth (when
    cfg.output_depth)]. ``cfg.background`` composites rgb + T_final·bg
    (T_final = 1 − alpha); the alpha row is kept only when
    ``cfg.output_alpha``; the depth row always passes through."""
    if cfg.background is not None:
        bg = jnp.asarray(cfg.background, jnp.float32)[:, None, None]
        rgb = fb[:3] + (1.0 - fb[3:4]) * bg
        rows = [rgb]
        if cfg.output_alpha:
            rows.append(fb[3:4])
        if cfg.output_depth:
            rows.append(fb[4:5])
        return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rgb
    return fb


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_frame_static(scene, cam, cfg):
    return _render_impl(scene, cam, cfg, None)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_frame_time(scene, cam, cfg, time_value):
    return _render_impl(scene, cam, cfg, time_value)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_frame_sat(scene, cam, cfg, sat_state):
    return _render_impl(scene, cam, cfg, None, None, sat_state)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _render_frame_time_sat(scene, cam, cfg, time_value, sat_state):
    return _render_impl(scene, cam, cfg, time_value, None, sat_state)


_warned_default_tiers = False


def render_frame(
    scene: GaussianScene,
    cam: CameraParams,
    cfg: RenderConfig,
    time_value: Optional[jnp.ndarray] = None,
    sat_state: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, RenderStats]:
    """Render one frame. Returns a planar (3, H, W) float32 framebuffer.

    The planar layout matches the reference's SSBO framebuffer
    (``canvas.hpp:104-106``): channel-major, row y=0 at NDC y=−1.
    ``cfg`` is static (hashable dataclass); camera and time are traced, so
    interaction never recompiles. Dispatches to one of four fixed-arity
    jitted entry points (a single Optional-arg jit trips the C++ fast-path
    argument matching on this jax version when arities are mixed).

    With ``cfg.sat_cull`` pass ``sat_state`` (the previous frame's cutoff
    image; ``ops.satcull.initial_cutoff`` for frame 1) — the return
    becomes ``(fb, stats, new_sat_state)``. ``make_renderer`` threads the
    state automatically.
    """
    if (
        cfg.tiers is None
        and cfg.compositor == "packed"
        and cfg.packed_compatible
        and scene.num_gaussians >= 200_000
    ):
        # Packed path only: the xla/diff compositors have no tier ladder,
        # so suggesting calibration there (e.g. large-scene training runs
        # through the diff compositor) would be a no-op tuning knob.
        # The uncalibrated default ladder gives EVERY splat 4 base lanes —
        # up to ~4× sort-lane waste on small-splat scenes (the sort is the
        # frame's scaling cost). One warning per process, not per frame.
        global _warned_default_tiers
        if not _warned_default_tiers:
            _warned_default_tiers = True
            import warnings

            warnings.warn(
                f"render_frame: {scene.num_gaussians} gaussians with the "
                "uncalibrated default instance ladder — use "
                "make_renderer(scene, cfg, auto_tier=True) (or set "
                "cfg.tiers from calibrate_tiers) to cut sort lanes up to "
                "~4x.",
                stacklevel=2,
            )
    if sat_state is not None:
        if time_value is None:
            fn, args = _render_frame_sat, (scene, cam, cfg, sat_state)
        else:
            fn = _render_frame_time_sat
            args = (scene, cam, cfg, time_value, sat_state)
    elif time_value is None:
        fn, args = _render_frame_static, (scene, cam, cfg)
    else:
        fn, args = _render_frame_time, (scene, cam, cfg, time_value)
    try:
        return fn(*args)
    except ValueError as e:  # pragma: no cover - jax 0.9 fastpath bug
        # ROOT CAUSE (fixed in ops/instances.py): a module-level jnp array
        # (the old SENTINEL) closed over by the trace is hoisted into an
        # extra executable parameter that jax 0.9's C++ jit fast path
        # fails to supply on re-dispatch. No such captured-device-array
        # constants remain, so this should never fire; it is kept as
        # defense-in-depth against the same bug class (clearing the trace
        # cache and recompiling is safe and idempotent). Scoped: warn
        # loudly (so a genuine arity bug is not silently recompiled away)
        # and only handle the exact message this jax version emits.
        if "buffers but compiled program expected" not in str(e):
            raise
        import warnings

        warnings.warn(
            "render_frame: jit fast-path arity mismatch workaround fired "
            f"(jax {jax.__version__}); recompiling. If this repeats every "
            "frame, an argument-arity bug is being masked.",
            RuntimeWarning,
            stacklevel=2,
        )
        fn.clear_cache()
        return fn(*args)


def format_tiers(tiers) -> str:
    """Ladder → the 'm:k,m:k' wire format used between bench subprocesses."""
    return ",".join(f"{m}:{k}" for m, k in tiers)


def parse_tiers(s: str):
    return tuple(tuple(int(v) for v in part.split(":")) for part in s.split(","))


def ladder_lanes(tiers, num_gaussians: int) -> int:
    """Total sort-lane count a ladder emits (the frame sort's scaling
    cost). A k = 0 first tier is the all-N broadcast base (BASE mode,
    ops/instances.py); a (0, C) first tier is COMPACTED mode's static
    lane capacity (the sort covers exactly C lanes); every other tier
    costs exactly m·k lanes."""
    tiers = tuple(tiers)
    if tiers and int(tiers[0][0]) == 0:
        return int(tiers[0][1])
    ladder = [(m, min(int(k), num_gaussians)) for m, k in tiers]
    lanes = sum(m * k for m, k in ladder)
    if ladder and ladder[0][1] == 0:
        lanes += ladder[0][0] * num_gaussians
    return lanes


def area_histogram(scene, cam_params, cfg) -> "np.ndarray":
    """Projection-only effective-lane histogram over AREA_BUCKETS — the
    input :func:`calibrate_tiers` needs, WITHOUT compositing. Cheap enough
    to run on the CPU backend (full-scene projection takes seconds), which
    lets calibration probes avoid both a TPU session claim and a second
    large TPU executable in the measuring process. Runs the SAME jax code
    path as the device render (ops.instances.effective_hist — prepack +
    live-tile scan + bucket loop), so it must agree exactly with the
    histogram the packed render path reports (pinned by
    tests/test_packed_pipeline.py)."""
    import numpy as np

    return np.asarray(_hist_probe(cfg)(scene, cam_params)[0], dtype=np.int64)


def emission_total(scene, cam_params, cfg) -> int:
    """Exact per-pose emission total (Σ live-tile lanes over valid
    splats) from the same jitted probe as :func:`area_histogram` — the
    ``emission_max`` input of :func:`calibrate_tiers`. Equals the packed
    render's ``stats.num_instances`` for the same pose."""
    return int(_hist_probe(cfg)(scene, cam_params)[1])


@functools.lru_cache(maxsize=32)
def _hist_probe(cfg):
    """One jitted histogram probe per static cfg — calibration loops call
    area_histogram once per orbit pose, so a fresh jit closure per call
    would retrace the full N-scale projection+prepack graph every pose."""

    def probe(scene, cam_params):
        from gaussianrenderer_tpu.ops.instances import (
            _eff_hist,
            _nscale_prepack,
        )

        proj = preprocess_gaussians(
            scene,
            cam_params,
            width=cfg.width,
            height=cfg.height,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            sh_degree=cfg.sh_degree,
            quantize_centers=cfg.quantize_centers,
            ewa_dilation=cfg.ewa_dilation,
            ewa_compensate=cfg.ewa_compensate,
        )
        pk = _nscale_prepack(
            proj,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
        )
        total = jnp.sum(jnp.where(pk.valid, pk.eff, 0))
        return _eff_hist(pk.valid, pk.eff), total

    return jax.jit(probe)


def calibrate_tiers(
    area_hist,
    num_tiles: int = 1024,
    headroom: float = 1.3,
    min_k: int = 256,
    max_tiers: int = 7,
    emission_max: "Optional[int]" = None,
    pose_hists=None,
):
    """Choose an area ladder from a frame's tile-area histogram.

    Evaluates a candidate ladder for each base-tier width m₀ ∈ {1, 2, 4, 8}
    (every Gaussian gets m₀ lanes; each wider tier is sized to its class
    population × headroom, power-of-two bucketed so nearby camera poses
    reuse the jit cache) and returns the one minimizing TOTAL sort lanes —
    the sort is the scaling cost, and lanes ≈ cost.

    The compacted head capacity defaults to Σ m_c·count_c over the
    max-combined histogram — which sums PER-CLASS maxima across poses
    and so overestimates the worst-pose TOTAL up to ~2× on real orbits
    (different poses max different classes), and every excess lane is
    frame-sort time. Two clamps tighten it (post tier-merge, because
    merging also inflates the head by window-model costs):

    * ``pose_hists`` (a sequence of per-pose histograms — the exact
      information the max-combine destroys): the head is clamped to
      1.25× the worst pose's Σ count_b·m_cover(b) under the CHOSEN
      ladder — the exact capacity the compacted buffer consumes (every
      member of a class pays its full tier width m, not its live-tile
      count).
    * ``emission_max`` (a single frame's exact Σ eff —
      ``emission_total`` probe or ``stats.num_instances``): a LOWER
      bound on capacity need (bucketing pays m ≥ eff per member), so it
      clamps with a 1.6× margin; the overflow flag + auto_tier retry
      loop covers outliers (never silent).
    """
    import numpy as np

    from gaussianrenderer_tpu.ops.instances import AREA_BUCKETS

    if area_hist is None:
        raise ValueError(
            "area_hist is None — tier calibration needs the packed render "
            "path (cfg.compositor='packed' with packed_compatible tiles)"
        )
    hist = np.asarray(area_hist, dtype=np.int64)
    edges = list(AREA_BUCKETS)
    if hist.shape[0] != len(edges) + 1:
        raise ValueError(
            f"area_hist has {hist.shape[0]} entries; expected "
            f"{len(edges) + 1} (AREA_BUCKETS changed?)"
        )
    n_valid = max(int(hist.sum()), 1)

    def round_up(x, sig_bits: int = 2):
        """Round up to ``sig_bits`` significant bits (2 → {1, 1.25, 1.5,
        1.75}·2^k): tight enough that the pow2-style bucketing overhead is
        ≤25% (a plain pow2 round after headroom wastes up to 2×), coarse
        enough that nearby camera poses keep hitting the same jit cache
        entry. The fine-rounded windowed candidate uses sig_bits = 4
        (≤6.25% overhead) to dip under the sort-cost knee — worth a few
        extra recalibration cache keys."""
        x = max(int(x), 1)
        if x <= (1 << sig_bits):
            return x
        k = x.bit_length() - 1 - sig_bits
        return -(-x >> k) << k  # ceil to a multiple of 2^k

    def eff_headroom(count):
        """Adaptive slack: class-count fluctuation across nearby camera
        poses scales like 1/√count, so big classes (100k+) need only part
        of the margin while small ones keep all of it. Overflow
        recalibration (make_renderer auto_tier) is the safety net."""
        observed = max(count, 1)
        rel = min(max((50_000.0 / observed) ** 0.5, 0.4), 1.0)
        return 1.0 + (headroom - 1.0) * rel

    #: Cost model (measured, v5e, round 3 — tools sort6/ladder_ab probes).
    #: The v3 6-operand frame sort costs ~5.8 ns/lane up to a hard knee at
    #: ~8M lanes, then jumps +~15 ms (7.8M → 45.4 ms, 8.4M → 63.8 ms,
    #: 12.3M → 85 ms). A wide-tier SELECTED Gaussian costs ~12 ns through
    #: the single (7, N) lane-axis selection gather (+~6.5 ms for the
    #: selection key sort); the fully-windowed mode replaces both with an
    #: 8-operand payload-carrying area sort at ~8.5 ns per VALID splat.
    SORT_NS_PER_LANE = 5.8
    SORT_KNEE_LANES = 8_050_000
    SORT_KNEE_NS = 15e6
    SEL_NS_PER_ROW = 12.0
    SEL_SORT_NS = 6.5e6
    AREA_SORT_NS_PER_SPLAT = 6.2  # 20.1 ms @2.92M valid at 8 ops; the
    # depth fold cut it to 7 operands (~12% less — re-measure pending)
    #: Every emitted lane also pays broadcast-emission work.
    EMIT_NS_PER_LANE = 1.5
    #: Compacted-mode window lanes additionally pay the member-major
    #: relayout + dynamic_update_slice placement.
    EMIT_NS_COMPACT = 2.0

    def sort_cost(lanes):
        return (
            lanes * (SORT_NS_PER_LANE + EMIT_NS_PER_LANE)
            + (SORT_KNEE_NS if lanes > SORT_KNEE_LANES else 0.0)
        )

    def wide_tiers_from(start_i: int, sig_bits: int = 2):
        """(tiers, lanes) for one windowed tier per non-empty histogram
        edge from ``start_i`` up (a splat pays at most ~1.5× its true tile
        area in lanes with the fine AREA_BUCKETS). The lane model matches
        the emission exactly: each tier emits from an EXACT dynamic-slice
        window of its class segment (ops/instances.py), so its lane cost
        is m·k — no cumulative-window surcharge. An empty bucket is
        skipped; its (empty) area range folds into the next tier's
        class."""
        tiers = []
        lanes = 0
        for i in range(start_i, len(edges)):
            count = int(hist[i])
            if count == 0:
                continue
            k = max(min_k, round_up(int(count * eff_headroom(count)), sig_bits))
            tiers.append((edges[i], k))
            lanes += edges[i] * k
        if int(hist[-1]) > 0 and num_tiles > edges[-1]:
            # Splats covering more than 1024 tiles (up to the whole screen).
            m = round_up(num_tiles)
            count = int(hist[-1])
            k = max(64, round_up(int(count * eff_headroom(count)), sig_bits))
            tiers.append((m, k))
            lanes += m * k
        return tiers, lanes

    def ladder_for(base_i: int):
        """BASE-mode candidate: all-N base tier of width edges[base_i]
        (k = 0 marks the broadcast base — ops/instances.py) + windowed
        wider tiers. Returns (tiers, cost in ns-equivalents)."""
        m0 = edges[base_i]
        wide, wide_lanes = wide_tiers_from(base_i + 1)
        tiers = [(m0, 0)] + wide
        lanes = m0 * n_valid + wide_lanes
        k_sel = sum(k for _, k in wide)
        cost = (
            sort_cost(lanes)
            + k_sel * SEL_NS_PER_ROW
            + (SEL_SORT_NS if wide else 0.0)
        )
        return tuple(tiers), cost

    def ladder_windowed(sig_bits: int = 2):
        """FULLY-WINDOWED candidate (every tier k > 0): lanes ≈ the true
        instance count; pays one 8-operand payload area sort over all N
        instead of base broadcast + selection gather. The measured sort
        knee (~8M lanes) is what makes this mode win on 3M-splat scenes."""
        tiers, lanes = wide_tiers_from(0, sig_bits)
        cost = sort_cost(lanes) + n_valid * AREA_SORT_NS_PER_SPLAT
        return tuple(tiers), cost

    def ladder_compacted(cap_margin: float = 1.10):
        """COMPACTED candidate ((0, C) head — ops/instances.py): the frame
        sort covers exactly C lanes ≈ the modeled per-pose emission
        Σ m_c·count_c, while class windows k_c only bound MEMBERSHIP
        (emission compute at ~EMIT_NS/lane, not sorted lanes at ~7.3), so
        they get DOUBLE the adaptive headroom AND no min_k floor tax on
        the sort — class-population drift across poses stops causing
        overflow; only the total emission breaching C does. This is the
        winning mode on small scenes (min_k floors dominate a windowed
        ladder's lanes) and on resize/orbit configs whose class
        populations migrate."""
        tiers = []
        need = 0  # modeled emission total Σ m_c·count_c
        emit_lanes = 0  # window lanes Σ m_c·k_c (emission compute)
        for i in range(len(edges)):
            count = int(hist[i])
            if count == 0:
                continue
            margin = 1.0 + 2.0 * (eff_headroom(count) - 1.0)
            k = max(min_k, round_up(int(count * margin), 2))
            tiers.append((edges[i], k))
            need += edges[i] * count
            emit_lanes += edges[i] * k
        if int(hist[-1]) > 0 and num_tiles > edges[-1]:
            m = round_up(num_tiles)
            count = int(hist[-1])
            k = max(64, round_up(int(count * 2.0), 2))
            tiers.append((m, k))
            need += m * count
            emit_lanes += m * k
        if not tiers:
            return (), float("inf")
        cap = round_up(int(need * cap_margin) + 1024, 4)
        cost = (
            cap * SORT_NS_PER_LANE
            + (SORT_KNEE_NS if cap > SORT_KNEE_LANES else 0.0)
            + emit_lanes * EMIT_NS_COMPACT
            + n_valid * AREA_SORT_NS_PER_SPLAT
        )
        return ((0, cap),) + tuple(tiers), cost

    def merge_down(tiers):
        """Greedily merge adjacent windowed tiers until ≤ max_tiers entries.

        Merging (m_i, k_i) into the next-wider (m_j, k_j) costs exactly
        k_i·(m_j − m_i) extra lanes (every class-i member now gets m_j
        lanes); pick the cheapest pair each round. Caps the emission/sort
        graph size — each tier adds a dynamic-slice + broadcast + concat
        subgraph, and jit compile time scales with it (~60% more HLO for a
        10-tier vs 4-tier ladder, measured on the c4 shapes). A k = 0
        first tier is the broadcast base (not windowed) and never merges.

        A (0, C) COMPACTED capacity head never merges either, but it must
        GROW with each merge: class-i members now emit m_j lanes each, so
        the per-pose emission total the capacity was sized on rises by up
        to count_i·(m_j − m_i) ≤ k_i·(m_j − m_i). Sizing C from pre-merge
        classes under-provisioned exactly this (caught by a TPU verify
        drive: calibrated ladder, overflow=True).
        """
        tiers = list(tiers)
        # Skip a non-class head entry: k = 0 broadcast base (BASE mode)
        # or m = 0 capacity (COMPACTED mode) — neither may merge.
        first = 0 if (tiers and tiers[0][1] > 0 and tiers[0][0] > 0) else 1
        extra = 0
        while len(tiers) > max_tiers and len(tiers) > 2:
            costs = [
                (tiers[i][1] * (tiers[i + 1][0] - tiers[i][0]), i)
                for i in range(first, len(tiers) - 1)
            ]
            cost, i = min(costs)
            m_hi = tiers[i + 1][0]
            k_merged = round_up(tiers[i][1] + tiers[i + 1][1])
            if tiers[0][0] == 0 and tiers[0][1] > 0:
                tiers[0] = (0, tiers[0][1] + cost)  # cost = k_i·(m_j − m_i)
            tiers[i + 1] = (m_hi, k_merged)
            del tiers[i]
            extra += cost * (SORT_NS_PER_LANE + EMIT_NS_PER_LANE)
        return tuple(tiers), extra

    # Pick the candidate minimizing the modeled frame cost: base-mode
    # ladders for m0 ∈ {1, 2, 3, 4, 6, 8} plus the fully-windowed ladder
    # (see the cost model above).
    best = None
    candidates = [ladder_for(base_i) for base_i in range(6)]
    candidates.append(ladder_windowed())
    candidates.append(ladder_windowed(sig_bits=4))
    candidates.append(ladder_compacted())
    for tiers, cost in candidates:
        if not tiers:
            continue
        tiers, extra = merge_down(tiers)
        cost += extra
        if best is None or cost < best[1]:
            best = (tiers, cost)
    tiers = best[0]

    # Tail guard: the histogram only sees the PROBED pose(s); a pose the
    # probe missed can produce splats wider than the observed maximum
    # (e.g. the camera orbits closer). One spare tier at ≥2× the widest
    # observed class (a bucket edge when possible, so class counts stay
    # hist-sliced) costs a few k lanes and turns that case from truncation
    # into coverage. Splats beyond even this still flag overflow.
    last_m = tiers[-1][0]
    if last_m < num_tiles:
        guard_m = next(
            (e for e in edges if e >= 2 * last_m), round_up(num_tiles)
        )
        guard_m = min(guard_m, round_up(num_tiles))
        if guard_m > last_m:
            tiers = tiers + ((guard_m, max(64, min_k)),)

    # Post-merge head clamp from OBSERVED per-pose emission (docstring).
    if tiers and int(tiers[0][0]) == 0 and (
        pose_hists is not None or emission_max is not None
    ):
        widths = [int(m) for m, _ in tiers[1:]]

        def pose_need(h):
            need = 0
            for i, e in enumerate(edges):
                c = int(h[i])
                if c:
                    need += c * next(
                        (m for m in widths if m >= e), widths[-1]
                    )
            c = int(h[len(edges)])
            if c:
                need += c * widths[-1]
            return need

        bounds = []
        if pose_hists is not None:
            bounds.append(
                1.25 * max(pose_need(h) for h in pose_hists)
            )
        if emission_max is not None:
            # Capacity is consumed at full tier width m_hi per member
            # while emission_max sums eff > m_lo, so the worst
            # capacity/emission ratio is the ladder's largest
            # m_hi/(m_lo+1) class-edge jump — an eff distribution
            # clustered just above bucket lower edges can exceed a flat
            # 1.6× margin and trigger overflow-retry recompiles every
            # session (ADVICE r4). Derive the margin from the chosen
            # ladder (floored at the measured-safe 1.6).
            lo = 0
            r_worst = 1.0
            for m in widths:
                r_worst = max(r_worst, m / (lo + 1))
                lo = m
            bounds.append(max(1.6, 1.1 * r_worst) * float(emission_max))
        cap_bound = round_up(int(max(bounds)) + 1024, 4)
        if cap_bound < int(tiers[0][1]):
            tiers = ((0, cap_bound),) + tuple(tiers[1:])
    return tiers


def make_renderer(
    scene: GaussianScene,
    cfg: RenderConfig,
    auto_tier: bool = False,
    overflow_check_every: int = 16,
    scene_path: "Optional[str]" = None,
):
    """Returns ``render(cam_params, time=None) -> (fb, stats)`` with the scene
    closed over (device-resident, jit-cached once per config).

    ``auto_tier=True`` calibrates the packed path's instance-tier ladder
    from the first frame's tile-area histogram, then periodically checks
    the overflow flag and re-calibrates/boosts when coverage was truncated
    — the static-shape answer to the reference's mid-frame dynamic buffer
    sizing (``render.cu:962-971``). Checks are amortized (every
    ``overflow_check_every`` frames) because a device→host sync is not free.

    ``scene_path`` (the file the scene was loaded from) enables the
    calibration SIDECAR (scene/calibration.py): a cached ladder for this
    (scene content, config bucket) seeds ``cfg.tiers`` so the session's
    FIRST compile is already the calibrated executable — the first-frame
    auto_tier recalibration (a second full compile) is skipped — and any
    later recalibration is stored back for the next session. Advisory:
    stale/corrupt sidecars only cost a recalibration, never a wrong
    image (overflow still flags)."""
    import dataclasses

    # Transpose to render layout once per session (PreparedScene): saves
    # ~6 ms/frame of (N, small)→(small, N) relayout at 3M splats.
    if not hasattr(scene, "pos_t"):
        scene = scene.prepared()
    state = {"cfg": cfg, "frame": 0, "seeded": False}
    if scene_path and auto_tier and cfg.compositor == "packed":
        from gaussianrenderer_tpu.scene.calibration import load_calibration

        entry = load_calibration(scene_path, cfg)
        if entry and entry.get("tiers"):
            seeded = dataclasses.replace(cfg, tiers=entry["tiers"])
            # The chunk is part of the executable identity: without it
            # the warm session compiles a DIFFERENT program than the
            # cold session cached (measured: warm start stayed at 167 s
            # on a chunk mismatch, session_start.jsonl).
            if (
                entry.get("packed_chunk")
                and cfg.packed_chunk == RenderConfig().packed_chunk
            ):
                seeded = dataclasses.replace(
                    seeded, packed_chunk=int(entry["packed_chunk"])
                )
            state["cfg"] = seeded
            state["seeded"] = True

    def _call(cam, time_value):
        # Keep the positional arity stable per cache entry (None time is
        # simply omitted) — mixing arities for the same static cfg trips
        # the jit fast-path argument matching on some jax versions.
        cfg_now = state["cfg"]
        sat = None
        if (
            cfg_now.sat_cull
            and cfg_now.compositor == "packed"
            and cfg_now.packed_compatible
        ):
            if state.get("sat") is None:
                from gaussianrenderer_tpu.ops.satcull import initial_cutoff

                state["sat"] = initial_cutoff(
                    cfg_now.tiles_x, cfg_now.tiles_y,
                    cfg_now.tile_w, cfg_now.tile_h,
                )
            sat = state["sat"]
        if time_value is None:
            out = render_frame(scene, cam, cfg_now, sat_state=sat)
        else:
            out = render_frame(scene, cam, cfg_now, time_value, sat_state=sat)
        if sat is not None:
            fb, stats, new_sat = out
            state["sat"] = new_sat
            return fb, stats
        return out

    def _recalibrate(out, cam, time_value):
        """Calibrate from the frame's histogram; retry while truncating."""
        tries = 0
        while tries < 4:
            hist = out[1].area_hist
            headroom = 1.5 * (2.0**tries)
            if hist is not None:
                # The frame's EXACT emission total clamps the compacted
                # head (calibrate_tiers emission_max) — the histogram
                # model alone oversizes it ~2×, and every clamped lane
                # is frame-sort time. On an overflow retry the observed
                # total ≈ the truncating capacity, so the margin is
                # grown with the tries.
                emission_max = int(
                    int(out[1].num_instances) * (1.1 * 2.0**tries)
                )
                new_tiers = calibrate_tiers(
                    hist,
                    num_tiles=state["cfg"].num_tiles,
                    headroom=headroom,
                    emission_max=emission_max,
                )
                if new_tiers == state["cfg"].tiers and not bool(out[1].overflow):
                    break
                new_cfg = dataclasses.replace(
                    state["cfg"], tiers=new_tiers
                )
                # Measured chunk rule (config.auto_packed_chunk): apply
                # only over the default so an explicit user choice
                # sticks.
                if new_tiers and int(new_tiers[0][0]) == 0:
                    lanes = int(new_tiers[0][1])
                else:
                    lanes = ladder_lanes(
                        new_tiers, scene.num_gaussians
                    )
                auto_chunk = RenderConfig.auto_packed_chunk(lanes)
                if (
                    cfg.packed_chunk == RenderConfig().packed_chunk
                    and new_cfg.packed_chunk != auto_chunk
                ):
                    new_cfg = dataclasses.replace(
                        new_cfg, packed_chunk=auto_chunk
                    )
                state["cfg"] = new_cfg
            elif bool(out[1].overflow):
                state["cfg"] = dataclasses.replace(
                    state["cfg"],
                    tier_boost=min(state["cfg"].tier_boost + 1, 3),
                )
            else:
                break
            out = _call(cam, time_value)
            tries += 1
            if not bool(out[1].overflow):
                break
        return out

    def _store_sidecar():
        if scene_path and state["cfg"].tiers:
            from gaussianrenderer_tpu.scene.calibration import (
                store_calibration,
            )

            store_calibration(
                scene_path,
                cfg,
                state["cfg"].tiers,
                extra={"packed_chunk": state["cfg"].packed_chunk},
            )

    def _render(cam: CameraParams, time_value=None):
        out = _call(cam, time_value)
        if auto_tier and state["cfg"].compositor == "packed":
            state["frame"] += 1
            # A sidecar-seeded session's first compile already runs the
            # calibrated ladder — skip the unconditional first-frame
            # recalibration (its second compile is the 37-73 s class
            # cost the sidecar exists to remove); overflow-triggered
            # recalibration stays armed.
            first = state["frame"] == 1 and not (
                state["seeded"] and not bool(out[1].overflow)
            )
            # With the saturation cull active, frame 2 is the first
            # CULLED frame: its histogram is the culled population, and
            # recalibrating against it is what shrinks the static
            # ladder windows (and so the frame sort) to the culled lane
            # count — without this the cull only helps the compositor
            # (measured 121.6 vs 90.8 ms at c4, PERF_NOTES round 5).
            first |= state["frame"] == 2 and state["cfg"].sat_cull
            periodic = (state["frame"] - 1) % overflow_check_every == 0
            # Calibrate unconditionally on the first frame (the default
            # ladder is rarely lane-optimal); afterwards only when a
            # periodic check sees truncation.
            if first or (periodic and bool(out[1].overflow)):
                prev = state["cfg"].tiers
                out = _recalibrate(out, cam, time_value)
                if state["cfg"].tiers != prev or state["frame"] == 1:
                    _store_sidecar()
        return out

    # Expose the live (possibly auto_tier-recalibrated) config — sessions
    # and tests read the calibrated ladder from here.
    _render.current_cfg = lambda: state["cfg"]
    return _render


@jax.jit
def _fb_to_u8_device(fb):
    """(3,H,W) f32 → (H,W,3) uint8 ON DEVICE: the display fetch then
    moves 3 bytes/px instead of 12. The D2H hop is the dominant term of
    the user-visible viewer loop (measured 243 ms of a 294 ms
    orbit→frame at 800×800 through the dev tunnel — viewer_latency.jsonl
    — the same 4× applies to a direct-attached host's memcpy)."""
    img = jnp.transpose(fb, (1, 2, 0))
    return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def framebuffer_to_image(fb, flip_y: bool = True):
    """Planar (3,H,W) → (H,W,3) uint8 for display/PNG.

    ``flip_y=True`` matches the reference viewer default (UiSettings.flip,
    fragment-shader Y flip ``canvas.hpp:104-106``): framebuffer row 0 sits at
    NDC y=−1 (bottom), images want the top row first. Device arrays are
    converted to uint8 on device before the D2H fetch (4× fewer bytes —
    the fetch dominates the display loop); NumPy inputs convert on host.
    """
    import numpy as np

    if isinstance(fb, jnp.ndarray) and not isinstance(fb, np.ndarray):
        img = np.asarray(_fb_to_u8_device(fb))
        return img[::-1] if flip_y else img
    img = np.asarray(fb).transpose(1, 2, 0)
    if flip_y:
        img = img[::-1]
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype("uint8")


def save_png(fb, path: str, flip_y: bool = True) -> None:
    """Write a rendered framebuffer to a PNG file with no image-library
    dependency (stdlib zlib encoder shared with the browser viewer).
    Accepts the planar (3, H, W) float framebuffer render_frame returns,
    or an (H, W, 3) uint8 image."""
    import numpy as np

    from gaussianrenderer_tpu.web_viewer import _png_encode

    arr = np.asarray(fb)
    if arr.ndim == 3 and arr.shape[0] == 3 and arr.dtype != np.uint8:
        arr = framebuffer_to_image(arr, flip_y=flip_y)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(
            f"expected (3,H,W) float or (H,W,3) uint8, got "
            f"{arr.shape} {arr.dtype}"
        )
    with open(path, "wb") as fh:
        fh.write(_png_encode(np.ascontiguousarray(arr)))
