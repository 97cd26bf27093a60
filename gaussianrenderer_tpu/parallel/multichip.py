"""Multi-chip rendering via ``shard_map`` over a device mesh.

The reference is strictly single-GPU ("Multi-GPU scaling" is future work,
reference README.md:58; SURVEY.md §2.11). This module is the TPU-native
scale-out design:

* **Gaussian-parallel preprocessing** (data parallel): the scene SoA is
  sharded along N over the mesh axis; each chip culls/colors/projects its
  shard locally (no communication).
* **all_gather of compact projected records** over ICI: 24 floats per
  splat — positions/SH/quats stay sharded; only screen-space results move.
* **Tile-parallel compositing** (spatial parallel): the tile grid is split
  into row strips, one per chip; each chip expands/sorts/composites only
  the instances overlapping its strip. The framebuffer comes back sharded
  by rows.

Communication rides one ``all_gather`` on the ICI ring; there are no
scatter/atomic patterns left to port (SURVEY.md §2.11 mapping).  The same
structure differentiates: ``jax.grad`` through ``shard_map`` transposes the
all_gather into a reduce-scatter of feature gradients back to the owning
chip (used by the training step in ``gaussianrenderer_tpu/train.py``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.render import _finish_fb  # noqa: F401 (strip bg/alpha)
from gaussianrenderer_tpu.ops.compositing import (
    FEAT_CONIC_A,
    FEAT_CX,
    FEAT_DIM,
    FEAT_OPACITY,
    FEAT_R,
    FEAT_XMIN,
    build_features,
    composite_tiles_diff,
    composite_tiles_xla,
    gather_sorted_features,
)
from gaussianrenderer_tpu.ops.projection import (
    ProjectedGaussians,
    preprocess_gaussians,
    slice_spacetime,
)
from gaussianrenderer_tpu.ops.tiling import build_sorted_instances
from gaussianrenderer_tpu.scene.camera import CameraParams
from gaussianrenderer_tpu.scene.gaussians import GaussianScene

AXIS = "chips"


def make_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices; ICI ring axis ``chips``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=(AXIS,))


def shard_scene(scene: GaussianScene, mesh: Mesh) -> GaussianScene:
    """Pad N to the mesh size and shard every leaf along the Gaussian axis."""
    d = mesh.shape[AXIS]
    n = scene.num_gaussians
    padded = scene.pad_to(((n + d - 1) // d) * d)
    sharding = NamedSharding(mesh, P(AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), padded
    )


def balance_strip_bounds(
    row_loads, n_strips: int
) -> Tuple[int, ...]:
    """Contiguous tile-row partition minimizing the maximum strip load.

    ``row_loads`` is instances (or lanes) per tile row — measurable on CPU
    from a projection probe (tools/strip_slack_probe.py). Returns
    ``n_strips + 1`` cumulative row boundaries for
    :func:`render_frame_multichip`'s ``strip_bounds``. The equal-row
    decomposition's measured worst-pose slack is 1.69× (c4) / 2.61× (c6)
    (docs/sort_plan.md); load-balanced boundaries are the recovery lever
    because scene mass concentrates in the horizon rows. Binary search on
    the max-load bound + greedy packing (optimal for contiguous
    partitions); trailing strips may be empty (zero rows) when fewer than
    ``n_strips`` parts suffice.
    """
    loads = [max(0, int(v)) for v in np.asarray(row_loads).ravel()]
    if len(loads) == 0 or n_strips < 1:
        raise ValueError("need ≥1 row and ≥1 strip")

    def parts_needed(cap: int) -> int:
        parts, acc = 1, 0
        for v in loads:
            if v > cap:
                return len(loads) + 1  # single row exceeds cap: infeasible
            if acc + v > cap:
                parts += 1
                acc = v
            else:
                acc += v
        return parts

    lo, hi = max(loads), sum(loads)
    while lo < hi:
        mid = (lo + hi) // 2
        if parts_needed(mid) <= n_strips:
            hi = mid
        else:
            lo = mid + 1
    bounds, acc = [0], 0
    for i, v in enumerate(loads):
        if acc + v > lo and len(bounds) < n_strips:
            bounds.append(i)
            acc = v
        else:
            acc += v
    bounds += [len(loads)] * (n_strips + 1 - len(bounds))
    return tuple(bounds)


def row_loads_from_rects(tmin_y, tmax_y, rect_w, valid, tiles_y) -> np.ndarray:
    """Instance lanes per tile row from tile-rect arrays (NumPy). A splat
    contributes its rect width to every row its rect intersects — exactly
    how the strip restriction in ``_strip_render`` assigns instances.
    Shared by :func:`strip_row_loads` and tools/strip_slack_probe.py.

    O(N + tiles_y) difference-array form (add the width at the rect's
    first row, subtract past its last, prefix-sum) — the masked-reduction
    loop it replaces visited every splat once per row (~200M element
    visits per calibration pose at the 3M-splat bench scene)."""
    use = np.asarray(valid) & (tmax_y >= 0) & (tmin_y < tiles_y)
    lo = np.clip(tmin_y[use], 0, tiles_y - 1)
    hi = np.clip(tmax_y[use], 0, tiles_y - 1)
    w = np.asarray(rect_w)[use].astype(np.int64)
    d = np.zeros(tiles_y + 1, np.int64)
    np.add.at(d, lo, w)
    np.subtract.at(d, hi + 1, w)
    return np.cumsum(d)[:tiles_y]


def strip_row_loads(scene: GaussianScene, cam: CameraParams,
                    cfg: RenderConfig) -> np.ndarray:
    """Instance lanes per tile row for one pose — the
    :func:`balance_strip_bounds` input. Projection-only (no sort/render);
    run it on a calibration pose like ``render.calibrate_tiers`` does its
    area probe."""
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
        quantize_centers=cfg.quantize_centers,
        ewa_dilation=cfg.ewa_dilation,
        ewa_compensate=cfg.ewa_compensate,
    )
    from gaussianrenderer_tpu.ops.instances import packed_valid_np

    # The packed emitter's population (quantized-opacity threshold), so
    # the balance reflects what each strip actually sorts.
    valid = packed_valid_np(proj.valid, proj.opacity)
    tmin = np.asarray(proj.tile_min)
    tmax = np.asarray(proj.tile_max)
    rect_w = (tmax[:, 0] - tmin[:, 0] + 1).astype(np.int64)
    return row_loads_from_rects(
        tmin[:, 1], tmax[:, 1], rect_w, valid, cfg.tiles_y
    )


def strip_geometry(
    strip_bounds: Tuple[int, ...], num_devices: int, tiles_y: int
) -> Tuple[Tuple[int, ...], int]:
    """Validate ``strip_bounds`` and return ``(per-strip row counts,
    rows_max)`` — the ONE derivation of the balanced-strip geometry shared
    by the render path, the training loss, and the reassembly (they must
    agree exactly or framebuffer shapes desync from loss masks)."""
    if (
        len(strip_bounds) != num_devices + 1
        or strip_bounds[0] != 0
        or strip_bounds[-1] != tiles_y
        or any(
            strip_bounds[i] > strip_bounds[i + 1]
            for i in range(num_devices)
        )
    ):
        raise ValueError(
            f"strip_bounds must be {num_devices + 1} non-decreasing row "
            f"boundaries from 0 to tiles_y={tiles_y}, got {strip_bounds}"
        )
    diffs = tuple(
        strip_bounds[i + 1] - strip_bounds[i] for i in range(num_devices)
    )
    return diffs, max(max(diffs), 1)


def balance_strips_for_scene(
    scene: GaussianScene,
    cam: CameraParams,
    cfg: RenderConfig,
    n_strips: int,
) -> Tuple[int, ...]:
    """One-call scene calibration for :func:`render_frame_multichip`'s
    ``strip_bounds``: probe one pose's per-row loads, partition. Slack
    with pose-0-derived bounds stays ≤~1.2-1.3× across a full orbit
    (strip_slack_balanced.jsonl) because row occupancy is scene-shaped,
    not pose-shaped."""
    return balance_strip_bounds(
        strip_row_loads(scene, cam, cfg), n_strips
    )


def _strip_render(
    scene_shard: GaussianScene,
    cam: CameraParams,
    cfg: RenderConfig,
    num_devices: int,
    capacity: int,
    compositor: str,
    time_value: Optional[jnp.ndarray],
    with_stats: bool = False,
    strip_bounds: Optional[Tuple[int, ...]] = None,
):
    """Per-chip body run under shard_map (axis: AXIS).

    ``compositor`` ∈ {"packed", "xla", "diff"}: "packed" runs the same
    gather-free tiered-broadcast + Pallas pipeline as the single-chip fast
    path, restricted to this chip's tile-row strip; "xla"/"diff" keep the
    gather-based reference compositors (training uses "diff" — it is the
    reverse-differentiable path).

    Returns ``fb_strip`` or, with ``with_stats``, ``(fb_strip, overflow,
    center_clipped)`` — truncation is never silent (project rule), so
    multi-chip callers surface the per-chip flags reduced over the mesh.
    """
    chip = jax.lax.axis_index(AXIS)
    if strip_bounds is None:
        # Equal-row strips: every chip owns tiles_y/D contiguous rows.
        tiles_y_local = cfg.tiles_y // num_devices
        strip_y0 = chip * tiles_y_local
        rows_here = tiles_y_local
    else:
        # Load-balanced contiguous strips (balance_strip_bounds): every
        # chip COMPUTES rows_max rows (one static shape for shard_map)
        # but OWNS rows_here of them; tiles beyond its range get zero
        # instance counts and cost only Pallas grid overhead.
        diffs, tiles_y_local = strip_geometry(
            strip_bounds, num_devices, cfg.tiles_y
        )
        strip_y0 = jnp.asarray(strip_bounds[:-1], jnp.int32)[chip]
        rows_here = jnp.asarray(diffs, jnp.int32)[chip]

    # 4D spacetime: time-conditioned opacity + position slicing (same
    # helper as the single-chip path; runs shard-locally before the
    # all_gather, so sliced positions ride the record exchange).
    scene_shard, extra_opacity = slice_spacetime(scene_shard, time_value)

    # ---- local (gaussian-parallel) preprocessing on this chip's shard
    proj = preprocess_gaussians(
        scene_shard,
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
    )
    feats_local = build_features(proj)  # (N/D, 16)

    # Compact per-splat record: features + tile rect + depth + valid.
    record = jnp.concatenate(
        [
            feats_local,
            proj.tile_min.astype(jnp.float32),
            proj.tile_max.astype(jnp.float32),
            proj.depth[:, None],
            proj.valid.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )  # (N/D, 22)

    # ---- one ICI collective: everyone sees every projected splat
    record_all = jax.lax.all_gather(record, AXIS, tiled=True)  # (N, 22)

    feats_all = record_all[:, :FEAT_DIM]
    # The strip compositor indexes pixels strip-locally; shift the
    # y-dependent feature columns (center y, aabb ymin/ymax) into strip
    # coordinates.
    y_off = (strip_y0 * cfg.tile_h).astype(jnp.float32)
    shift = jnp.zeros((FEAT_DIM,), jnp.float32).at[jnp.array([1, 10, 12])].set(y_off)
    feats_all = feats_all - shift[None, :]
    # Clamp the strip-local pixel AABB to the OWNED pixel rows. The packed
    # path's windowed tiers re-derive tile rects from this AABB
    # (ops/instances.py "bit-exact" re-derivation) and mask each class
    # member against its class area; without the clamp a splat straddling
    # the strip's last owned row sorts into a class by its row-clamped
    # rect area (tile_max_strip below) but re-derives a LARGER area from
    # the unclamped AABB — the defense mask then drops it silently from
    # rows this chip owns (balanced strips only: there rows_here can be
    # < the static tiles_y_local). Pixels past the owned rows are cropped
    # at reassembly, so the clamp changes no visible coverage.
    y_hi = jnp.maximum(rows_here * cfg.tile_h - 1, 0).astype(jnp.float32)
    aabb_y = jnp.clip(feats_all[:, jnp.array([10, 12])], 0.0, y_hi)
    feats_all = feats_all.at[:, jnp.array([10, 12])].set(aabb_y)
    tile_min = record_all[:, FEAT_DIM : FEAT_DIM + 2].astype(jnp.int32)
    tile_max = record_all[:, FEAT_DIM + 2 : FEAT_DIM + 4].astype(jnp.int32)
    depth_all = record_all[:, FEAT_DIM + 4]
    valid_all = record_all[:, FEAT_DIM + 5] > 0.5

    # ---- restrict to this chip's tile strip (rows [strip_y0, +rows_here))
    tmin_y = jnp.maximum(tile_min[:, 1], strip_y0) - strip_y0
    tmax_y = jnp.minimum(tile_max[:, 1], strip_y0 + rows_here - 1) - strip_y0
    intersects = tmin_y <= tmax_y
    valid_strip = valid_all & intersects
    tile_min_strip = jnp.stack([tile_min[:, 0], tmin_y], axis=-1)
    tile_max_strip = jnp.stack([tile_max[:, 0], tmax_y], axis=-1)

    num_tiles_local = cfg.tiles_x * tiles_y_local
    strip_h = tiles_y_local * cfg.tile_h

    if compositor == "packed":
        # Strip-local packed fast path: same gather-free pipeline as the
        # single-chip renderer (ops/instances.py + tile_render2), fed from
        # the all_gathered record re-assembled into a ProjectedGaussians.
        from gaussianrenderer_tpu.ops.instances import build_packed_instances
        from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
            composite_tiles_packed,
        )

        proj_full = ProjectedGaussians(
            valid=valid_strip,
            depth=depth_all,
            color=feats_all[:, FEAT_R : FEAT_R + 3],
            opacity=feats_all[:, FEAT_OPACITY],
            center_px=feats_all[:, FEAT_CX : FEAT_CX + 2],
            conic=feats_all[:, FEAT_CONIC_A : FEAT_CONIC_A + 3],
            aabb_px=feats_all[:, FEAT_XMIN : FEAT_XMIN + 4],
            tile_min=tile_min_strip,
            tile_max=tile_max_strip,
        )
        # COMPACTED ladders ((0, C) head, ops/instances.py): scale the
        # lane capacity to this strip's share so S strips actually divide
        # the frame sort. The measured worst-pose strip slack for
        # equal-row strips is 1.69× (c4) / 2.61× (c6) (docs/sort_plan.md
        # round-3 section) — 3× margin covers it; truncation beyond that
        # still flags overflow (never silent). Class windows stay global
        # (they bound membership only, which per strip is conservative).
        strip_tiers = cfg.tiers
        if strip_tiers and int(strip_tiers[0][0]) == 0 and num_devices > 1:
            cap_global = int(strip_tiers[0][1])
            cap_strip = min(
                cap_global, -(-3 * cap_global // num_devices)
            )
            strip_tiers = ((0, cap_strip),) + tuple(strip_tiers[1:])
        inst = build_packed_instances(
            proj_full,
            tiles_x=cfg.tiles_x,
            tiles_y=tiles_y_local,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            capacity=capacity,
            near=cam.near,
            far=cam.far,
            tier_boost=cfg.tier_boost,
            tiers=strip_tiers,
            want_depth=cfg.output_depth,
        )
        fb_strip = composite_tiles_packed(
            inst.packed_feats,
            inst.tile_start,
            inst.tile_count,
            tiles_x=cfg.tiles_x,
            tiles_y=tiles_y_local,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            width=cfg.width,
            height=strip_h,  # full strip; global crop happens outside
            chunk=cfg.packed_chunk,
            out_alpha=cfg.output_alpha or cfg.background is not None,
            depth_row=inst.depth_f32,
        )
        fb_strip = _finish_fb(fb_strip, cfg)  # bg/alpha/depth are per-pixel
        if with_stats:
            return fb_strip, inst.overflow, inst.center_clipped
        return fb_strip

    proj_strip = proj._replace(
        valid=valid_strip,
        depth=depth_all,
        tile_min=tile_min_strip,
        tile_max=tile_max_strip,
    )
    assignment = build_sorted_instances(
        proj_strip,
        tiles_x=cfg.tiles_x,
        num_tiles=num_tiles_local,
        capacity=capacity,
        depth_scale=cfg.depth_scale,
        near=cam.near,
        far=cam.far,
    )
    want_alpha = cfg.output_alpha or cfg.background is not None
    if compositor == "diff":
        from gaussianrenderer_tpu.ops.compositing import (
            gather_sorted_features_seg,
        )
        from gaussianrenderer_tpu.ops.pallas.tile_train import (
            composite_tiles_train,
            train_kernel_compatible,
        )

        # Training path: the seg-gather (sort+cumsum gradient transpose,
        # not XLA's scalar-bound scatter-add) over the STRIP's emission
        # counts, and the Pallas forward+backward compositor when the
        # tile shape allows — both run per shard under shard_map, so the
        # single-chip kernels apply unchanged to the strip's local grid.
        sorted_feats = gather_sorted_features_seg(
            feats_all, assignment, cfg.chunk_size, proj_strip, capacity,
            num_tiles_local,
        )
        if (
            cfg.diff_kernel
            and train_kernel_compatible(cfg.tile_w, cfg.tile_h)
            and not cfg.output_depth
        ):
            fb_strip = composite_tiles_train(
                sorted_feats,
                assignment.tile_start,
                assignment.tile_count,
                tiles_x=cfg.tiles_x,
                tiles_y=tiles_y_local,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
                width=cfg.width,
                height=strip_h,
                chunk_size=cfg.chunk_size,
                return_alpha=want_alpha,
            )
        else:
            fb_strip = composite_tiles_diff(
                sorted_feats,
                assignment.tile_start,
                assignment.tile_count,
                tiles_x=cfg.tiles_x,
                tiles_y=tiles_y_local,
                tile_w=cfg.tile_w,
                tile_h=cfg.tile_h,
                width=cfg.width,
                height=strip_h,
                chunk_size=cfg.chunk_size,
                max_chunks=cfg.diff_max_chunks,
                return_alpha=want_alpha,
                return_depth=cfg.output_depth,
            )
    else:
        sorted_feats = gather_sorted_features(
            feats_all, assignment, cfg.chunk_size
        )
        fb_strip = composite_tiles_xla(
            sorted_feats,
            assignment.tile_start,
            assignment.tile_count,
            tiles_x=cfg.tiles_x,
            tiles_y=tiles_y_local,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
            width=cfg.width,
            height=strip_h,  # full strip; global crop happens outside
            chunk_size=cfg.chunk_size,
            return_alpha=want_alpha,
            return_depth=cfg.output_depth,
        )  # (3.., strip_h, W)
    fb_strip = _finish_fb(fb_strip, cfg)  # bg/alpha are per-pixel
    if with_stats:
        return fb_strip, assignment.overflow, jnp.bool_(False)
    return fb_strip


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "strip_bounds")
)
def render_frame_multichip(
    scene: GaussianScene,
    cam: CameraParams,
    cfg: RenderConfig,
    mesh: Mesh,
    time_value: Optional[jnp.ndarray] = None,
    strip_bounds: Optional[Tuple[int, ...]] = None,
):
    """Render one frame across every chip of ``mesh``.

    Returns ``(fb, stats)`` where ``fb`` is the (3, H, W) framebuffer
    ((4, H, W) with ``cfg.output_alpha``; ``cfg.background`` composites
    per strip, identically to the single-chip path)
    (row-strip sharded over the mesh) and ``stats`` is a dict of mesh-reduced
    flags: ``overflow`` (instance truncation on any chip) and
    ``center_clipped`` (packed center-encode saturation on any chip) —
    truncation is never silent.

    With ``strip_bounds=None``, requires ``cfg.tiles_y`` divisible by the
    mesh size (equal-row strip decomposition). Pass
    :func:`balance_strip_bounds`'s output (a static tuple of D+1
    cumulative tile-row boundaries) for LOAD-BALANCED contiguous strips:
    each chip then computes the max strip height (one static shape) but
    owns only its boundary range, and the final framebuffer is
    reassembled from the per-chip valid rows. The scene must be
    pre-sharded with :func:`shard_scene`. The compositor follows
    ``cfg.compositor`` exactly like the single-chip path ("packed" needs
    ``cfg.packed_compatible``; otherwise the XLA compositor runs).
    """
    d = mesh.shape[AXIS]
    if strip_bounds is None:
        if cfg.tiles_y % d != 0:
            raise ValueError(
                f"tiles_y={cfg.tiles_y} must be divisible by mesh size {d}"
            )
    else:
        strip_geometry(strip_bounds, d, cfg.tiles_y)  # validates
    capacity = cfg.instance_capacity(scene.num_gaussians) // d
    if cfg.compositor == "packed" and cfg.packed_compatible:
        compositor = "packed"
    elif cfg.compositor == "diff":
        compositor = "diff"
    else:
        compositor = "xla"

    def body(scene_shard, cam_rep):
        fb_strip, overflow, clipped = _strip_render(
            scene_shard,
            cam_rep,
            cfg=cfg,
            num_devices=d,
            capacity=capacity,
            compositor=compositor,
            time_value=time_value,
            with_stats=True,
            strip_bounds=strip_bounds,
        )
        # any() over the mesh: max of the per-chip flags as int32.
        overflow = jax.lax.pmax(overflow.astype(jnp.int32), AXIS) > 0
        clipped = jax.lax.pmax(clipped.astype(jnp.int32), AXIS) > 0
        return fb_strip, overflow, clipped

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(AXIS), scene),
            jax.tree_util.tree_map(lambda _: P(), cam),
        ),
        out_specs=(
            P(None, AXIS, None),  # framebuffer sharded by row strips
            P(),
            P(),
        ),
        check_vma=False,
    )
    fb, overflow, clipped = fn(scene, cam)
    stats = {"overflow": overflow, "center_clipped": clipped}
    if strip_bounds is not None:
        # Reassemble: chip c's block is rows_max·tile_h rows, of which the
        # first (bounds[c+1]−bounds[c])·tile_h are real. Static offsets →
        # a concat of slices (a layout shuffle XLA schedules on ICI).
        diffs, rows_max = strip_geometry(strip_bounds, d, cfg.tiles_y)
        blocks = [
            fb[:, c * rows_max * cfg.tile_h :
               c * rows_max * cfg.tile_h + diffs[c] * cfg.tile_h]
            for c in range(d)
            if diffs[c] > 0
        ]
        fb = jnp.concatenate(blocks, axis=1)
    return fb[:, : cfg.height, : cfg.width], stats
