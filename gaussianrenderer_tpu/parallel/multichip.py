"""Multi-chip rendering via ``shard_map`` over a device mesh.

The reference is strictly single-GPU ("Multi-GPU scaling" is future work,
reference README.md:58; SURVEY.md §2.11). This module is the TPU-native
scale-out design:

* **Gaussian-parallel preprocessing** (data parallel): the scene SoA is
  sharded along N over the mesh axis; each chip culls/colors/projects its
  shard locally (no communication).
* **record exchange** over ICI: positions/SH/quats stay sharded; only
  screen-space results move, as quantized 28 B/splat records
  (``ops.instances.encode_record_rows`` — same encodings as the packed
  sort payload). Two shapes: a quantized ``all_gather`` ("gather_q"),
  or the strip-OWNERSHIP ``all_to_all`` ("a2a_q",
  :func:`_exchange_a2a`) that ships each record only to the strips its
  tile rect intersects — SURVEY §2.11's "all-to-all by tile ownership"
  mapping — so wire bytes AND post-exchange compute are ~N/D per chip,
  not N. The legacy 22-f32 (88 B) record ("gather32") remains the
  bit-exact reference plane and the xla/diff (training) plane — the AD
  transpose of its all_gather is the reduce-scatter that lands feature
  gradients on the owning chip.
* **Tile-parallel compositing** (spatial parallel): the tile grid is split
  into row strips, one per chip; each chip expands/sorts/composites only
  the instances overlapping its strip. The framebuffer comes back sharded
  by rows.

There are no scatter/atomic patterns left to port (SURVEY.md §2.11
mapping); the exchange is the only communication in the frame.
Bytes/chip/frame at the c4 bench shape (3M splats): 264 MB (gather32)
→ 84 MB (gather_q) → ~16 MB uncalibrated / ~6 MB calibrated (a2a_q at
16 chips) — see PERF_NOTES.md round-4 data-plane table for the ICI
model.
"""

from __future__ import annotations

import functools
import math
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
from gaussianrenderer_tpu.ops.instances import (
    SENTINEL as SENTINEL_U32,
    decode_record_rows,
    encode_record_rows,
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


def tile_loads_from_rects(
    tmin, tmax, valid, tiles_x: int, tiles_y: int
) -> np.ndarray:
    """Instance lanes per TILE from tile-rect arrays (NumPy) — the 2-D
    analog of :func:`row_loads_from_rects` for rect-strip balancing.
    4-corner difference array + double prefix sum: O(N + tiles)."""
    tmin = np.asarray(tmin)
    tmax = np.asarray(tmax)
    use = (
        np.asarray(valid)
        & (tmax[:, 1] >= 0) & (tmin[:, 1] < tiles_y)
        & (tmax[:, 0] >= 0) & (tmin[:, 0] < tiles_x)
    )
    x0 = np.clip(tmin[use, 0], 0, tiles_x - 1)
    x1 = np.clip(tmax[use, 0], 0, tiles_x - 1)
    y0 = np.clip(tmin[use, 1], 0, tiles_y - 1)
    y1 = np.clip(tmax[use, 1], 0, tiles_y - 1)
    d = np.zeros((tiles_y + 1, tiles_x + 1), np.int64)
    np.add.at(d, (y0, x0), 1)
    np.subtract.at(d, (y0, x1 + 1), 1)
    np.subtract.at(d, (y1 + 1, x0), 1)
    np.add.at(d, (y1 + 1, x1 + 1), 1)
    return np.cumsum(np.cumsum(d, axis=0), axis=1)[:tiles_y, :tiles_x]


def balance_strip_rects(tile_loads, n_strips: int):
    """2-D load-balanced rect decomposition: contiguous row BANDS, each
    split into contiguous column ranges (VERDICT r4 #3 — past ~16 chips
    the row-only partition is quantization-bound: 34 tile rows over 16
    strips leaves slack 1.31 from row indivisibility alone, not load).

    Tries every (bands, cols-per-band) factorization of ``n_strips``
    (including the pure-row (D, 1) layout), balancing row-band
    boundaries on row sums and each band's column boundaries on that
    band's column sums (both optimal-contiguous via
    :func:`balance_strip_bounds`), and returns the best as
    ``(row_bounds, col_bounds_per_band)`` — the ``strip_rects`` input
    of :func:`render_frame_multichip` — plus its worst-rect slack
    (max rect load / ideal). Chips are ordered band-major.
    """
    loads = np.asarray(tile_loads, np.int64)
    tiles_y, tiles_x = loads.shape
    ideal = max(loads.sum() / max(n_strips, 1), 1.0)
    best = None
    for bands in range(1, n_strips + 1):
        if n_strips % bands:
            continue
        cols = n_strips // bands
        if bands > tiles_y or cols > tiles_x:
            continue
        row_bounds = balance_strip_bounds(loads.sum(axis=1), bands)
        col_bounds = []
        worst = 0
        for b in range(bands):
            y0, y1 = row_bounds[b], row_bounds[b + 1]
            band = loads[y0:y1]
            if band.size == 0:  # empty band: all columns to the last rect
                cb = tuple([0] * cols + [tiles_x])
            else:
                cb = balance_strip_bounds(band.sum(axis=0), cols)
            col_bounds.append(tuple(cb))
            for j in range(cols):
                worst = max(
                    worst,
                    int(loads[y0:y1, cb[j]:cb[j + 1]].sum()),
                )
        slack = worst / ideal
        if best is None or slack < best[2]:
            best = (tuple(row_bounds), tuple(col_bounds), slack)
    if best is None:
        raise ValueError(
            f"no rect factorization of {n_strips} fits a "
            f"{tiles_y}x{tiles_x} grid"
        )
    return (best[0], best[1]), best[2]


def rect_geometry(strip_rects, num_devices: int, tiles_y: int, tiles_x: int):
    """Validate a ``(row_bounds, col_bounds_per_band)`` rect spec and
    return ``(rects, rows_max, cols_max)`` where ``rects[chip]`` is
    ``(y0, rows, x0, cols)`` in band-major chip order. The ONE geometry
    derivation shared by the render path and the reassembly."""
    row_bounds, col_bounds = strip_rects
    bands = len(row_bounds) - 1
    if row_bounds[0] != 0 or row_bounds[-1] != tiles_y or any(
        row_bounds[i] > row_bounds[i + 1] for i in range(bands)
    ):
        raise ValueError(f"bad rect row_bounds {row_bounds}")
    if len(col_bounds) != bands:
        raise ValueError("col_bounds must have one tuple per row band")
    rects = []
    for b in range(bands):
        cb = col_bounds[b]
        if cb[0] != 0 or cb[-1] != tiles_x or any(
            cb[i] > cb[i + 1] for i in range(len(cb) - 1)
        ):
            raise ValueError(f"bad rect col_bounds {cb}")
        for j in range(len(cb) - 1):
            rects.append(
                (
                    row_bounds[b],
                    row_bounds[b + 1] - row_bounds[b],
                    cb[j],
                    cb[j + 1] - cb[j],
                )
            )
    if len(rects) != num_devices:
        raise ValueError(
            f"rect spec yields {len(rects)} rects for {num_devices} chips"
        )
    rows_max = max(max(r[1] for r in rects), 1)
    cols_max = max(max(r[3] for r in rects), 1)
    return tuple(rects), rows_max, cols_max


def balance_rects_for_scene(
    scene: GaussianScene,
    cam: CameraParams,
    cfg: RenderConfig,
    n_strips: int,
):
    """One-call 2-D rect calibration (the :func:`balance_strips_for_scene`
    analog): probe one pose's per-tile loads, partition into row bands ×
    column ranges. Returns ``(strip_rects, slack)``."""
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

    valid = packed_valid_np(proj.valid, proj.opacity)
    loads = tile_loads_from_rects(
        proj.tile_min, proj.tile_max, valid, cfg.tiles_x, cfg.tiles_y
    )
    return balance_strip_rects(loads, n_strips)


def a2a_caps_for_scene(
    scene: GaussianScene,
    cams,
    cfg: RenderConfig,
    n_strips: int,
    strip_bounds: Optional[Tuple[int, ...]] = None,
    margin: float = 1.5,
) -> Tuple[int, int, int]:
    """CPU calibration of the ownership-exchange window capacities.

    Counts, per (source shard, destination strip) pair, exactly the
    records :func:`_exchange_a2a` would route — FIRST-destination
    records to the main windows, 2-strip straddler copies to the
    straddler windows, wide (≥3-strip) records to the all_gather
    window — over one or more probe poses (``cams`` is a CameraParams
    or a sequence), and returns ``(cap, wide_cap, straddle_cap)`` with
    ``margin`` headroom (same role as the tier calibrator's window
    margins; overflow past the calibrated caps still flags, never
    silent). Shards are the contiguous N/D blocks :func:`shard_scene`
    lays out."""
    import numpy as np

    if isinstance(cams, CameraParams) or not isinstance(
        cams, (list, tuple)
    ):
        cams = [cams]
    d = n_strips
    if strip_bounds is None:
        if cfg.tiles_y % d != 0:
            raise ValueError(
                f"tiles_y={cfg.tiles_y} not divisible by {d}; pass "
                "strip_bounds"
            )
        t_loc = cfg.tiles_y // d
        strip_bounds = tuple(i * t_loc for i in range(d + 1))
    inner = np.asarray(strip_bounds[1:-1])
    n = scene.num_gaussians
    ns = -(-n // d)
    worst_cap, worst_wide, worst_straddle = 0, 0, 0
    for cam in cams:
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
        valid = np.asarray(proj.valid)
        tmin_y = np.asarray(proj.tile_min)[:, 1]
        tmax_y = np.asarray(proj.tile_max)[:, 1]
        s0 = np.searchsorted(inner, tmin_y, side="right")
        s1 = np.searchsorted(inner, tmax_y, side="right")
        wide = valid & (s1 - s0 >= 2)
        narrow = valid & ~wide
        for src in range(d):
            lo, hi = src * ns, min((src + 1) * ns, n)
            if lo >= hi:
                continue
            sl = slice(lo, hi)
            cnt = np.bincount(s0[sl][narrow[sl]], minlength=d)
            straddle = narrow[sl] & (s1[sl] > s0[sl])
            scnt = np.bincount(s1[sl][straddle], minlength=d)
            worst_cap = max(worst_cap, int(cnt.max()))
            worst_straddle = max(
                worst_straddle, int(scnt.max()) if scnt.size else 0
            )
            worst_wide = max(worst_wide, int(np.sum(wide[sl])))
    cap = max(256, int(math.ceil(worst_cap * margin)))
    wide_cap = max(128, int(math.ceil(worst_wide * margin)))
    straddle_cap = max(64, int(math.ceil(worst_straddle * margin)))
    return cap, wide_cap, straddle_cap


def _packed_strip_tail(
    proj_full: ProjectedGaussians,
    *,
    cam: CameraParams,
    cfg: RenderConfig,
    num_devices: int,
    capacity: int,
    tiles_y_local: int,
    strip_h: int,
    tiles_x_local: "Optional[int]" = None,
    strip_w: "Optional[int]" = None,
):
    """Strip-local packed fast path shared by BOTH exchange modes: the
    same gather-free pipeline as the single-chip renderer
    (ops/instances.py + tile_render2), fed a strip-restricted
    ProjectedGaussians. Returns (fb_strip, overflow, center_clipped)."""
    from gaussianrenderer_tpu.ops.instances import build_packed_instances
    from gaussianrenderer_tpu.ops.pallas.tile_render2 import (
        composite_tiles_packed,
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
        cap_strip = min(cap_global, -(-3 * cap_global // num_devices))
        strip_tiers = ((0, cap_strip),) + tuple(strip_tiers[1:])
    # The GLOBAL grid's depth-key split: a strip's smaller local grid
    # would quantize depth finer than single-chip, changing tie groups
    # (and alpha blending doesn't commute) — multichip_scale_probe
    # caught a 41 dB divergence at 100k splats from exactly this.
    g_tile_bits = max(int(cfg.num_tiles).bit_length(), 1)
    if tiles_x_local is None:
        tiles_x_local = cfg.tiles_x
    if strip_w is None:
        strip_w = cfg.width
    inst = build_packed_instances(
        proj_full,
        tiles_x=tiles_x_local,
        tiles_y=tiles_y_local,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        capacity=capacity,
        near=cam.near,
        far=cam.far,
        tier_boost=cfg.tier_boost,
        tiers=strip_tiers,
        want_depth=cfg.output_depth,
        depth_bits=min(32 - g_tile_bits, 24),
    )
    fb_strip = composite_tiles_packed(
        inst.packed_feats,
        inst.tile_start,
        inst.tile_count,
        tiles_x=tiles_x_local,
        tiles_y=tiles_y_local,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        width=strip_w,
        height=strip_h,  # full strip/rect; global crop happens outside
        chunk=cfg.packed_chunk,
        out_alpha=cfg.output_alpha or cfg.background is not None,
        depth_row=inst.depth_f32,
    )
    fb_strip = _finish_fb(fb_strip, cfg)  # bg/alpha/depth are per-pixel
    return fb_strip, inst.overflow, inst.center_clipped


def default_a2a_caps(
    num_gaussians: int, num_devices: int
) -> Tuple[int, int, int]:
    """Uncalibrated static capacities ``(cap, wide_cap, straddle_cap)``
    for the ownership exchange (:func:`_exchange_a2a`): ``cap`` bounds
    the FIRST-destination records one chip sends one strip (expected
    N/D² — 3× margin, same envelope the strip lane capacity uses),
    ``wide_cap`` bounds the rare records spanning ≥3 strips (giant
    splats — they ride a small all_gather window instead), and
    ``straddle_cap`` bounds one chip's 2-strip straddlers PER
    destination (measured strip duplication ≤0.2% — docs/sort_plan.md).
    Exceeding any flags overflow, never silent. Calibrate per scene
    with :func:`a2a_caps_for_scene` to cut exchange bytes."""
    ns = -(-num_gaussians // num_devices)
    cap = max(256, -(-3 * ns // num_devices))
    wide_cap = max(128, ns // 64)
    straddle_cap = max(128, ns // max(num_devices * 8, 8))
    return cap, wide_cap, straddle_cap


def _exchange_a2a(
    rows_local: jnp.ndarray,  # (7, N/D) u32 — encode_record_rows output
    tmin_y: jnp.ndarray,  # (N/D,) int32 global tile-row rect bounds
    tmax_y: jnp.ndarray,
    valid: jnp.ndarray,  # (N/D,) bool
    *,
    bounds: Optional[Tuple[int, ...]],  # D+1 cumulative row boundaries
    num_devices: int,
    caps: Tuple[int, int, int],
    strip_rects=None,  # 2-D (row_bounds, col_bounds_per_band) ownership
    tmin_x: Optional[jnp.ndarray] = None,  # required with strip_rects
    tmax_x: Optional[jnp.ndarray] = None,
):
    """Strip-OWNERSHIP exchange: each chip ships each of its projected
    records only to the strips the record's tile rect intersects,
    replacing the every-record-everywhere all_gather (SURVEY §2.11 maps
    multi-chip as an all-to-all by tile ownership; measured strip
    duplication is ≤0.2%, docs/sort_plan.md — ownership is nearly 1:1).

    Wire bytes per chip drop from N·28 (quantized all_gather) to
    ≈ D·cap·28 ≈ 3·(N/D)·28 with uncalibrated caps — a further D/3×
    on top of the 88 B → 28 B record quantization — and every
    post-exchange stage (prepack, live scan, area sort, emission) then
    runs at ~N/D lanes instead of N, which is what makes the per-chip
    compute actually divide by D.

    Mechanics (scatter-free; the MAIN sort runs N/D lanes — straddlers
    ride a key-only sort + small gather, exploiting the ≤0.2% measured
    duplication, so the exchange grouping costs ~½ of the naive
    two-slabs-per-record design):

    * destination strips ``s0 = strip(tmin_y)``, ``s1 = strip(tmax_y)``;
      every record emits ONE main key ``dest·(N/D) + index`` for its
      FIRST destination (index keeps GLOBAL scene order inside each
      destination — the frame sort's tie order then matches the gather
      path); records spanning ≥ 3 strips (rect taller than a whole
      strip) go to a D+1-th "wide" bucket.
    * ONE stable u32-key sort groups the 7 payload rows by first
      destination; per-destination counts come from masked sums, so
      each destination's records form a contiguous window at a cumsum
      offset — a dynamic_slice, not a gather.
    * 2-strip STRADDLERS (the second-destination copies) are selected
      by a (key, index)-only sort — 2 operands at N/D lanes — and ONE
      small (7, straddle_cap·D) column gather ("K small" rule), then
      window per second-destination the same way.
    * fixed-capacity windows ride ``all_to_all`` (main + straddler) and
      a small ``all_gather`` (wide); window tails beyond the real count
      are zeroed (valid bit cleared) so a straddler can never blend
      twice.

    Returns ``(rows_all (7, D·(cap + straddle_cap) + D·wide_cap),
    overflow)`` — receiver lanes are source-major so concatenation
    preserves scene order for first-destination records; straddler and
    wide copies append after (their frame-sort ties with main records
    may order differently than single-chip — only exact
    (tile, depth_q) ties are affected).
    """
    d = num_devices
    caps = tuple(caps)
    # DEPRECATED input shape: the current caps format is the 3-tuple
    # (cap, wide_cap, straddle_cap) that default_a2a_caps /
    # a2a_caps_for_scene return; persisting callers (e.g. the sidecar's
    # a2a_caps entry) should store that shape (ADVICE r4).
    if len(caps) == 2:  # legacy (cap, wide_cap): derive the straddle cap
        caps = caps + (max(128, rows_local.shape[1] // max(d * 8, 8)),)
    cap, wide_cap, scap = int(caps[0]), int(caps[1]), int(caps[2])
    ns = rows_local.shape[1]

    if strip_rects is not None:
        # 2-D RECT ownership (VERDICT r4 #3): destinations are every
        # (row band × column range) rect the record's tile rect
        # intersects. The downstream machinery is unchanged — it only
        # needs (first dest, second dest, destination count); a static
        # band loop derives them with per-band column searchsorted
        # (static tuples → compare chains, no gathers).
        row_bounds, col_bounds = strip_rects
        bands = len(row_bounds) - 1
        ndest = jnp.zeros_like(tmin_y)
        dest0 = jnp.zeros_like(tmin_y)
        dest1 = jnp.zeros_like(tmin_y)
        found0 = jnp.zeros(tmin_y.shape, bool)
        found1 = jnp.zeros(tmin_y.shape, bool)
        base = 0
        for b in range(bands):
            cb = col_bounds[b]
            cols = len(cb) - 1
            ov = (tmin_y <= row_bounds[b + 1] - 1) & (
                tmax_y >= row_bounds[b]
            )
            c0 = jnp.zeros_like(tmin_x)
            c1 = jnp.zeros_like(tmax_x)
            for e in cb[1:-1]:
                c0 = c0 + (tmin_x >= e).astype(jnp.int32)
                c1 = c1 + (tmax_x >= e).astype(jnp.int32)
            cnt_b = jnp.where(ov, c1 - c0 + 1, 0)
            ndest = ndest + cnt_b
            chip0 = base + c0
            dest0 = jnp.where(~found0 & ov, chip0, dest0)
            second_here = ov & ~found0 & (cnt_b >= 2)
            dest1 = jnp.where(~found1 & second_here, chip0 + 1, dest1)
            later = ov & found0 & ~found1
            dest1 = jnp.where(later, chip0, dest1)
            found1 = found1 | second_here | later
            found0 = found0 | ov
            base += cols
        wide_rec = valid & (ndest >= 3)
        narrow = valid & ~wide_rec
        straddle = narrow & (ndest == 2)
        s0, s1 = dest0, dest1
    else:
        def strip_of(row):
            s = jnp.zeros_like(row)
            for b in bounds[1:-1]:
                s = s + (row >= b).astype(jnp.int32)
            return s

        s0 = strip_of(tmin_y)
        s1 = strip_of(tmax_y)
        wide_rec = valid & (s1 - s0 >= 2)
        narrow = valid & ~wide_rec
        straddle = narrow & (s1 > s0)
    idx = jnp.arange(ns, dtype=jnp.uint32)
    nsu = jnp.uint32(ns)
    key0 = jnp.where(
        narrow,
        s0.astype(jnp.uint32) * nsu + idx,
        jnp.where(wide_rec, jnp.uint32(d) * nsu + idx, SENTINEL_U32),
    )
    sorted_ = jax.lax.sort(
        (key0,) + tuple(rows_local[i] for i in range(rows_local.shape[0])),
        num_keys=1,
        is_stable=True,
    )
    srows = jnp.stack(sorted_[1:], axis=0)  # (7, ns) first-dest-grouped

    cnts = jnp.stack(
        [jnp.sum((narrow & (s0 == c)).astype(jnp.int32)) for c in range(d)]
    )
    scnts = jnp.stack(
        [jnp.sum((straddle & (s1 == c)).astype(jnp.int32)) for c in range(d)]
    )
    cnt_w = jnp.sum(wide_rec.astype(jnp.int32))
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnts)]
    )
    sstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(scnts)]
    )
    # Pad so every fixed-size window slices in-bounds without clamping
    # (a clamp would shift a full window's contents).
    pad = max(cap, wide_cap)
    srows = jnp.concatenate(
        [srows, jnp.zeros((srows.shape[0], pad), jnp.uint32)], axis=1
    )

    wins = []
    lane = jnp.arange(cap, dtype=jnp.int32)
    for c in range(d):
        win = jax.lax.dynamic_slice_in_dim(srows, starts[c], cap, axis=1)
        wins.append(jnp.where((lane < cnts[c])[None, :], win, 0))
    send = jnp.stack(wins, axis=0)  # (D, 7, cap)
    recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0)
    narrow_all = jnp.moveaxis(recv, 0, 1).reshape(rows_local.shape[0], -1)

    # ---- straddler second-destination copies: key-only sort + gather.
    key1 = jnp.where(
        straddle, s1.astype(jnp.uint32) * nsu + idx, SENTINEL_U32
    )
    _, sel = jax.lax.sort(
        (key1, jnp.arange(ns, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    total_s = d * scap
    sel_cols = sel[: min(total_s, ns)]
    if total_s > ns:  # degenerate tiny-shard case: pad the selection
        sel_cols = jnp.concatenate(
            [sel_cols, jnp.zeros((total_s - ns,), jnp.int32)]
        )
    st_rows = rows_local[:, sel_cols]  # (7, D·scap) — small-K gather
    st_rows = jnp.concatenate(
        [st_rows, jnp.zeros((st_rows.shape[0], scap), jnp.uint32)], axis=1
    )
    swins = []
    slane = jnp.arange(scap, dtype=jnp.int32)
    for c in range(d):
        # sstarts are positions within the straddler-sorted PREFIX; the
        # prefix itself starts at column 0 of st_rows (sel is sorted by
        # key1 so straddlers occupy the first Σ scnts columns).
        win = jax.lax.dynamic_slice_in_dim(
            st_rows, jnp.minimum(sstarts[c], total_s), scap, axis=1
        )
        swins.append(jnp.where((slane < scnts[c])[None, :], win, 0))
    ssend = jnp.stack(swins, axis=0)  # (D, 7, scap)
    srecv = jax.lax.all_to_all(ssend, AXIS, split_axis=0, concat_axis=0)
    straddle_all = jnp.moveaxis(srecv, 0, 1).reshape(
        rows_local.shape[0], -1
    )

    wwin = jax.lax.dynamic_slice_in_dim(srows, starts[d], wide_cap, axis=1)
    wlane = jnp.arange(wide_cap, dtype=jnp.int32)
    wwin = jnp.where((wlane < cnt_w)[None, :], wwin, 0)
    wide_all = jax.lax.all_gather(wwin, AXIS, axis=1, tiled=True)

    rows_all = jnp.concatenate(
        [narrow_all, straddle_all, wide_all], axis=1
    )
    overflow = (
        jnp.any(cnts > cap)
        | jnp.any(scnts > scap)
        | (cnt_w > wide_cap)
    )
    return rows_all, overflow


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
    exchange: str = "gather32",
    a2a_caps: Optional[Tuple[int, int, int]] = None,
    strip_rects=None,  # 2-D (row_bounds, col_bounds_per_band) ownership
):
    """Per-chip body run under shard_map (axis: AXIS).

    ``compositor`` ∈ {"packed", "xla", "diff"}: "packed" runs the same
    gather-free tiered-broadcast + Pallas pipeline as the single-chip fast
    path, restricted to this chip's tile-row strip; "xla"/"diff" keep the
    gather-based reference compositors (training uses "diff" — it is the
    reverse-differentiable path).

    ``exchange`` picks the packed path's data plane: "gather32" (legacy
    22-f32 all_gather — always used by xla/diff, whose f32 features must
    carry gradients), "gather_q" (quantized 28 B/splat all_gather —
    encode_record_rows), or "a2a_q" (quantized strip-OWNERSHIP
    all_to_all, :func:`_exchange_a2a` — wire bytes AND post-exchange
    compute per chip drop to ~N/D scale).

    Returns ``fb_strip`` or, with ``with_stats``, ``(fb_strip, overflow,
    center_clipped)`` — truncation is never silent (project rule), so
    multi-chip callers surface the per-chip flags reduced over the mesh.
    """
    chip = jax.lax.axis_index(AXIS)
    strip_x0 = None  # set for 2-D rect strips only
    tiles_x_local = cfg.tiles_x
    if strip_rects is not None:
        # 2-D rect strips (row bands × column ranges): every chip
        # computes the (rows_max, cols_max) envelope (one static shape
        # for shard_map) but owns only its rect.
        rects, rows_max, cols_max = rect_geometry(
            strip_rects, num_devices, cfg.tiles_y, cfg.tiles_x
        )
        arr = jnp.asarray(rects, jnp.int32)  # (D, 4): y0, rows, x0, cols
        strip_y0 = arr[chip, 0]
        rows_here = arr[chip, 1]
        strip_x0 = arr[chip, 2]
        cols_here = arr[chip, 3]
        tiles_y_local = rows_max
        tiles_x_local = cols_max
    elif strip_bounds is None:
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

    if compositor == "packed" and exchange != "gather32":
        # ---- quantized record exchange (28 B/splat; packed path only —
        # the xla/diff compositors keep f32 records because training
        # differentiates through the exchange and integer rows carry no
        # gradients). Decoded fields are exactly what the packed
        # pipeline's own quantizers reproduce, so the image matches the
        # f32-record path to the conic's ~2⁻²⁴ re-Cholesky term
        # (decode_record_rows docstring).
        rows_local = encode_record_rows(proj)  # (7, N/D) u32
        ex_overflow = jnp.bool_(False)
        if exchange == "a2a_q":
            if strip_rects is not None:
                bounds_eq = None
            elif strip_bounds is None:
                t_loc = cfg.tiles_y // num_devices
                bounds_eq = tuple(
                    i * t_loc for i in range(num_devices + 1)
                )
            else:
                bounds_eq = strip_bounds
            caps = a2a_caps or default_a2a_caps(
                rows_local.shape[1] * num_devices, num_devices
            )
            rows_all, ex_overflow = _exchange_a2a(
                rows_local,
                proj.tile_min[:, 1],
                proj.tile_max[:, 1],
                proj.valid,
                bounds=bounds_eq,
                num_devices=num_devices,
                caps=caps,
                strip_rects=strip_rects,
                tmin_x=proj.tile_min[:, 0],
                tmax_x=proj.tile_max[:, 0],
            )
        else:  # "gather_q"
            rows_all = jax.lax.all_gather(
                rows_local, AXIS, axis=1, tiled=True
            )
        proj_g, cq_sat = decode_record_rows(
            rows_all,
            tiles_x=cfg.tiles_x,
            tiles_y=cfg.tiles_y,
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
        )
        # Strip rebase — the same shifts/clamps as the f32 path below,
        # applied to the decoded values (exact: every decoded coordinate
        # is a small multiple of 1/8 px, and y_off is an integer, so the
        # f32 subtraction is lossless).
        y_off = (strip_y0 * cfg.tile_h).astype(jnp.float32)
        y_hi = jnp.maximum(rows_here * cfg.tile_h - 1, 0).astype(
            jnp.float32
        )
        center_px = proj_g.center_px.at[:, 1].add(-y_off)
        aabb = proj_g.aabb_px
        aabb_y = jnp.clip(
            aabb[:, jnp.array([1, 3])] - y_off, 0.0, y_hi
        )
        aabb = aabb.at[:, jnp.array([1, 3])].set(aabb_y)
        tmin_y_s = jnp.maximum(proj_g.tile_min[:, 1], strip_y0) - strip_y0
        tmax_y_s = (
            jnp.minimum(proj_g.tile_max[:, 1], strip_y0 + rows_here - 1)
            - strip_y0
        )
        valid_strip = proj_g.valid & (tmin_y_s <= tmax_y_s)
        tmin_x_s = proj_g.tile_min[:, 0]
        tmax_x_s = proj_g.tile_max[:, 0]
        if strip_x0 is not None:
            # Rect strips: the same rebase in x (exact — coordinates
            # are 1/8-px multiples and x_off is an integer px count).
            x_off = (strip_x0 * cfg.tile_w).astype(jnp.float32)
            x_hi = jnp.maximum(cols_here * cfg.tile_w - 1, 0).astype(
                jnp.float32
            )
            center_px = center_px.at[:, 0].add(-x_off)
            aabb_x = jnp.clip(
                aabb[:, jnp.array([0, 2])] - x_off, 0.0, x_hi
            )
            aabb = aabb.at[:, jnp.array([0, 2])].set(aabb_x)
            tmin_x_s = jnp.maximum(tmin_x_s, strip_x0) - strip_x0
            tmax_x_s = (
                jnp.minimum(tmax_x_s, strip_x0 + cols_here - 1)
                - strip_x0
            )
            valid_strip = valid_strip & (tmin_x_s <= tmax_x_s)
        proj_full = ProjectedGaussians(
            valid=valid_strip,
            depth=proj_g.depth,
            color=proj_g.color,
            opacity=proj_g.opacity,
            center_px=center_px,
            conic=proj_g.conic,
            aabb_px=aabb,
            tile_min=jnp.stack([tmin_x_s, tmin_y_s], axis=-1),
            tile_max=jnp.stack([tmax_x_s, tmax_y_s], axis=-1),
        )
        strip_h = tiles_y_local * cfg.tile_h
        fb_strip, p_overflow, p_clipped = _packed_strip_tail(
            proj_full=proj_full,
            cam=cam,
            cfg=cfg,
            num_devices=num_devices,
            capacity=capacity,
            tiles_y_local=tiles_y_local,
            strip_h=strip_h,
            tiles_x_local=tiles_x_local,
            strip_w=tiles_x_local * cfg.tile_w,
        )
        # Exchange-window truncation and pre-exchange center saturation
        # fold into the existing flags — never silent.
        p_overflow = p_overflow | ex_overflow
        p_clipped = p_clipped | jnp.any(valid_strip & cq_sat)
        if with_stats:
            return fb_strip, p_overflow, p_clipped
        return fb_strip

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
    tmin_x = tile_min[:, 0]
    tmax_x = tile_max[:, 0]
    if strip_x0 is not None:
        # Rect strips: the same shift/clamp/restrict in x.
        x_off = (strip_x0 * cfg.tile_w).astype(jnp.float32)
        xshift = jnp.zeros((FEAT_DIM,), jnp.float32).at[
            jnp.array([FEAT_CX, FEAT_XMIN, FEAT_XMIN + 2])
        ].set(x_off)
        feats_all = feats_all - xshift[None, :]
        x_hi = jnp.maximum(cols_here * cfg.tile_w - 1, 0).astype(
            jnp.float32
        )
        aabb_x = jnp.clip(
            feats_all[:, jnp.array([FEAT_XMIN, FEAT_XMIN + 2])], 0.0, x_hi
        )
        feats_all = feats_all.at[
            :, jnp.array([FEAT_XMIN, FEAT_XMIN + 2])
        ].set(aabb_x)
        tmin_x = jnp.maximum(tmin_x, strip_x0) - strip_x0
        tmax_x = jnp.minimum(tmax_x, strip_x0 + cols_here - 1) - strip_x0
        valid_strip = valid_strip & (tmin_x <= tmax_x)
    tile_min_strip = jnp.stack([tmin_x, tmin_y], axis=-1)
    tile_max_strip = jnp.stack([tmax_x, tmax_y], axis=-1)

    num_tiles_local = tiles_x_local * tiles_y_local
    strip_h = tiles_y_local * cfg.tile_h

    if compositor == "packed":
        fb_strip, p_overflow, p_clipped = _packed_strip_tail(
            proj_full=ProjectedGaussians(
                valid=valid_strip,
                depth=depth_all,
                color=feats_all[:, FEAT_R : FEAT_R + 3],
                opacity=feats_all[:, FEAT_OPACITY],
                center_px=feats_all[:, FEAT_CX : FEAT_CX + 2],
                conic=feats_all[:, FEAT_CONIC_A : FEAT_CONIC_A + 3],
                aabb_px=feats_all[:, FEAT_XMIN : FEAT_XMIN + 4],
                tile_min=tile_min_strip,
                tile_max=tile_max_strip,
            ),
            cam=cam,
            cfg=cfg,
            num_devices=num_devices,
            capacity=capacity,
            tiles_y_local=tiles_y_local,
            strip_h=strip_h,
            tiles_x_local=tiles_x_local,
            strip_w=tiles_x_local * cfg.tile_w,
        )
        if with_stats:
            return fb_strip, p_overflow, p_clipped
        return fb_strip

    proj_strip = proj._replace(
        valid=valid_strip,
        depth=depth_all,
        tile_min=tile_min_strip,
        tile_max=tile_max_strip,
    )
    # Global-grid depth_bits: strips must quantize depth exactly like
    # the single-chip key or tie groups (and blend order) diverge.
    g_tile_bits = max(int(cfg.num_tiles).bit_length(), 1)
    assignment = build_sorted_instances(
        proj_strip,
        tiles_x=cfg.tiles_x,
        num_tiles=num_tiles_local,
        capacity=capacity,
        depth_scale=cfg.depth_scale,
        near=cam.near,
        far=cam.far,
        depth_bits=min(32 - g_tile_bits, 24),
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
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "strip_bounds", "exchange", "a2a_caps",
        "strip_rects",
    ),
)
def render_frame_multichip(
    scene: GaussianScene,
    cam: CameraParams,
    cfg: RenderConfig,
    mesh: Mesh,
    time_value: Optional[jnp.ndarray] = None,
    strip_bounds: Optional[Tuple[int, ...]] = None,
    exchange: str = "gather_q",
    a2a_caps: Optional[Tuple[int, int, int]] = None,
    strip_rects=None,
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

    ``exchange`` selects the packed path's record data plane (applies
    only when the packed compositor runs; xla/diff always exchange f32
    records for gradient flow):

    * ``"gather_q"`` (default) — quantized 28 B/splat all_gather
      (3.1× fewer wire bytes than the legacy 88 B record).
    * ``"a2a_q"`` — strip-ownership all_to_all: each chip receives only
      the ~N/D records overlapping its strip (static ``a2a_caps``
      windows, default :func:`default_a2a_caps`; truncation flags
      ``overflow``). Wire bytes AND post-exchange per-chip compute drop
      to ~N/D scale — the multi-chip scaling data plane.
    * ``"gather32"`` — the legacy f32 record exchange (bit-identical to
      the single-chip image; kept as the reference data plane).
    """
    if exchange not in ("gather32", "gather_q", "a2a_q"):
        raise ValueError(f"unknown exchange mode {exchange!r}")
    if strip_rects is not None:
        if strip_bounds is not None:
            raise ValueError("pass strip_bounds OR strip_rects, not both")
        if not (
            cfg.compositor == "packed" and cfg.packed_compatible
        ):
            raise ValueError(
                "2-D rect strips require the packed compositor (the "
                "xla/diff training paths keep row strips)"
            )
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
            exchange=exchange,
            a2a_caps=a2a_caps,
            strip_rects=strip_rects,
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
    if strip_rects is not None:
        # Reassemble band-major rect blocks: chip c's slab is
        # rows_max·tile_h rows × cols_max·tile_w cols, of which
        # (rows·th, cols·tw) are real. Per band: concat its rects'
        # column slices; then concat the bands' rows.
        rects, rows_max, cols_max = rect_geometry(
            strip_rects, d, cfg.tiles_y, cfg.tiles_x
        )
        th, tw = cfg.tile_h, cfg.tile_w
        row_bounds, col_bounds = strip_rects
        band_imgs = []
        c = 0
        for b in range(len(row_bounds) - 1):
            band_h = (row_bounds[b + 1] - row_bounds[b]) * th
            cols_here = []
            for j in range(len(col_bounds[b]) - 1):
                y0 = c * rows_max * th
                w_here = (col_bounds[b][j + 1] - col_bounds[b][j]) * tw
                if band_h > 0 and w_here > 0:
                    cols_here.append(
                        fb[:, y0 : y0 + band_h, :w_here]
                    )
                c += 1
            if band_h > 0 and cols_here:
                band_imgs.append(jnp.concatenate(cols_here, axis=2))
        fb = jnp.concatenate(band_imgs, axis=1)
        return fb[:, : cfg.height, : cfg.width], stats
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
