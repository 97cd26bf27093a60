"""Gaussian-splat optimization ("streaming training", reference roadmap).

The reference lists training as unfinished future work (reference
README.md:17: "Training Gaussians on the fly"). This module provides it
TPU-natively: the render step is differentiable end-to-end (scan-based
compositor, continuous splat centers), so scenes can be fitted to target
images with optax.

* :class:`SceneParams` — trainable pre-activation parameters (logit
  opacity, log scales) mirroring the on-disk PLY convention, so a trained
  scene round-trips through ``save_ply`` unchanged.
* :func:`make_train_step` — jit-compiled ``(params, opt_state, cam,
  target) -> (params, opt_state, loss)`` Adam/MSE step.
* :func:`make_multichip_train_step` — the same step sharded over a device
  mesh: gaussian-parallel gradients with tile-strip-parallel loss, one
  ``all_gather`` forward / ``reduce_scatter`` backward pair on ICI (the
  AD transpose of the gather in ``parallel/multichip.py``).
* :func:`densify_step` + :class:`DensifyState` — adaptive density control
  (the 3DGS clone/split/prune loop) under STATIC shapes: the parameter
  arrays keep a fixed budget N and pruned (dead) slots are RECYCLED into
  clones/splits of the highest-gradient donors with one episodic
  ``lax.sort`` + N-scale gather/scatter. Gathers are banned from the
  frame loop (PERF_NOTES layout rules), but densification runs once per
  few hundred steps — an N-scale gather there is microseconds. This is
  the static-shape answer to the CUDA implementations' realloc-and-append
  densification, the same way the tier ladder answers the reference's
  mid-frame buffer resize (``render.cu:962-971``).
* :func:`ssim` / :func:`l1_dssim_loss` — the standard 3DGS photometric
  loss (L1 + 0.2·D-SSIM), SSIM via two rank-1 depthwise convolutions.
* 4D: ``SceneParams.time_params`` is an optional trainable leaf;
  ``make_train_step(cfg, timed=True)`` takes a traced ``time_value`` so
  spacetime scenes (temporal opacity + per-splat velocity) fit to
  time-stamped targets through the differentiable ``slice_spacetime``.
* :func:`save_checkpoint` / :func:`load_checkpoint` — orbax training
  checkpoints (params + Adam moments + densify accumulators); restoring
  into a NamedSharding template resumes a multichip run shard-direct.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gaussianrenderer_tpu.config import RenderConfig
from gaussianrenderer_tpu.render import render_frame
from gaussianrenderer_tpu.scene.camera import CameraParams
from gaussianrenderer_tpu.scene.gaussians import GaussianScene


class SceneParams(NamedTuple):
    """Trainable pre-activation scene parameters (a jax pytree).

    ``time_params`` is the optional 4D leaf ((N, 2) temporal opacity or
    (N, 5) with linear motion, see ``ops.projection.slice_spacetime``);
    when present it is trained like every other leaf — ``slice_spacetime``
    is plain differentiable column math, so velocity/t_center/t_sigma
    receive gradients from time-conditioned targets. ``None`` leaves are
    empty pytree subtrees, so optax/densify/checkpoint treat a static
    scene exactly as before."""

    positions: jnp.ndarray  # (N, 3)
    sh: jnp.ndarray  # (N, 3*(deg+1)^2)
    raw_opacity: jnp.ndarray  # (N,) logit-space
    raw_scales: jnp.ndarray  # (N, 3) log-space
    quats: jnp.ndarray  # (N, 4) unnormalized
    time_params: Optional[jnp.ndarray] = None  # (N, 2) or (N, 5)

    @classmethod
    def from_scene(cls, scene: GaussianScene) -> "SceneParams":
        eps = 1e-6
        op = jnp.clip(scene.opacity, eps, 1.0 - eps)
        return cls(
            positions=scene.positions,
            sh=scene.sh,
            raw_opacity=jnp.log(op / (1.0 - op)),
            raw_scales=jnp.log(jnp.maximum(scene.scales, 1e-30)),
            quats=scene.quats,
            time_params=scene.time_params,
        )

    def to_scene(
        self, time_params: Optional[jnp.ndarray] = None
    ) -> GaussianScene:
        return GaussianScene(
            positions=self.positions,
            sh=self.sh,
            opacity=jax.nn.sigmoid(self.raw_opacity),
            scales=jnp.exp(self.raw_scales),
            quats=self.quats,
            time_params=(
                self.time_params if time_params is None else time_params
            ),
        )


def _training_config(cfg: RenderConfig) -> RenderConfig:
    return dataclasses.replace(cfg, compositor="diff", quantize_centers=False)


def render_for_training(
    params: SceneParams,
    cam: CameraParams,
    cfg: RenderConfig,
    time_value: Optional[jnp.ndarray] = None,
    ndc_probe: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Differentiable forward render of trainable parameters (at an
    optional traced time for spacetime scenes).

    ``ndc_probe``: optional (2, N) zeros whose gradient is the
    view-space center gradient ADC keys on (projection.py docstring).
    Probe renders call the impl directly — they only ever run inside an
    already-jitted train step, so the public dispatch layer would add
    nothing."""
    if ndc_probe is None:
        fb, _ = render_frame(
            params.to_scene(), cam, _training_config(cfg), time_value
        )
    else:
        from gaussianrenderer_tpu.render import _render_impl

        fb, _ = _render_impl(
            params.to_scene(), cam, _training_config(cfg), time_value,
            ndc_probe=ndc_probe,
        )
    return fb


def mse_loss(
    params: SceneParams,
    cam: CameraParams,
    target: jnp.ndarray,
    cfg: RenderConfig,
    time_value: Optional[jnp.ndarray] = None,
    ndc_probe: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    fb = render_for_training(params, cam, cfg, time_value, ndc_probe)
    return jnp.mean((fb - target) ** 2)


def _gauss_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    w = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return w / jnp.sum(w)


def _blur_hw(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of a planar (3, H, W) image.

    The 2D Gaussian window factorizes, so this is two rank-1 convs —
    each lowered by XLA to an MXU-friendly depthwise conv — instead of
    one 11×11 dense conv (121 MACs/px → 22)."""
    size = window.shape[0]
    kh = jnp.broadcast_to(window.reshape(1, 1, size, 1), (3, 1, size, 1))
    kw = jnp.broadcast_to(window.reshape(1, 1, 1, size), (3, 1, 1, size))
    x = img[None]  # NCHW
    # HIGHEST precision: var = blur(a²) − μ² is a catastrophic
    # cancellation of ~0.25-scale terms down to ~1e-4 variances; the TPU
    # default bf16 conv pass would dominate it with noise (CPU tests
    # cannot catch this — conftest forces the CPU backend).
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return x[0]


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    peak: float = 1.0,
) -> jnp.ndarray:
    """Mean SSIM between two planar (3, H, W) images (Wang et al. 2004,
    the constants and 11×11 σ=1.5 Gaussian window every 3DGS trainer
    uses). VALID boundary handling: edge pixels without a full window
    are excluded rather than zero-padded into the statistics."""
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    win = _gauss_window(window_size, sigma)
    mu_a = _blur_hw(a, win)
    mu_b = _blur_hw(b, win)
    var_a = _blur_hw(a * a, win) - mu_a * mu_a
    var_b = _blur_hw(b * b, win) - mu_b * mu_b
    cov = _blur_hw(a * b, win) - mu_a * mu_b
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def l1_dssim_loss(
    params: SceneParams,
    cam: CameraParams,
    target: jnp.ndarray,
    cfg: RenderConfig,
    time_value: Optional[jnp.ndarray] = None,
    ndc_probe: Optional[jnp.ndarray] = None,
    ssim_weight: float = 0.2,
) -> jnp.ndarray:
    """The standard 3DGS photometric loss: (1−λ)·L1 + λ·(1−SSIM)/2
    (Kerbl et al. §5, λ = 0.2). The reference never got to training
    (reference README.md:17), so this follows the paper all trained
    3DGS captures were produced with."""
    fb = render_for_training(params, cam, cfg, time_value, ndc_probe)
    l1 = jnp.mean(jnp.abs(fb - target))
    dssim = (1.0 - ssim(fb, target)) / 2.0
    return (1.0 - ssim_weight) * l1 + ssim_weight * dssim


def make_optimizer(lr: float = 1e-2) -> optax.GradientTransformation:
    return optax.adam(lr)


def _scale_sh_rest(div: float) -> optax.GradientTransformation:
    """Scale the non-DC SH columns' updates by 1/div. The (N, 3·(deg+1)²)
    SH leaf keeps DC in its first 3 columns; the 3DGS recipe trains the
    higher bands 20× slower than DC within the same tensor."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        # multi_transform hands the full masked pytree; only the (N, >3)
        # SH leaf is real here (MaskedNodes lack ndim and pass through).
        def f(u):
            if hasattr(u, "ndim") and u.ndim == 2 and u.shape[1] > 3:
                return jnp.concatenate(
                    [u[:, :3], u[:, 3:] * (1.0 / div)], axis=1
                )
            return u

        return jax.tree_util.tree_map(f, updates), state

    return optax.GradientTransformation(init, update)


def make_3dgs_optimizer(
    scene_extent: float = 1.0,
    *,
    position_lr_init: float = 1.6e-4,
    position_lr_final: float = 1.6e-6,
    position_lr_max_steps: int = 30_000,
    sh_lr: float = 2.5e-3,
    sh_rest_div: float = 20.0,
    opacity_lr: float = 5e-2,
    scale_lr: float = 5e-3,
    quat_lr: float = 1e-3,
    time_lr: float = 1e-3,
) -> optax.GradientTransformation:
    """The standard 3DGS per-parameter-group training schedule
    (Kerbl et al. 2023 defaults), composed from optax primitives.

    Positions train at ``position_lr_init·scene_extent`` decayed
    exponentially to ``position_lr_final·scene_extent`` over
    ``position_lr_max_steps``; SH DC at ``sh_lr`` with the higher bands
    ÷``sh_rest_div``; opacity/scale/rotation at their paper rates; the 4D
    ``time_params`` leaf (when present) at ``time_lr``. All groups use
    Adam with the paper's eps=1e-15. The state is an
    ``optax.multi_transform`` tree whose leaves keep the (N, …) leading
    dim, so :func:`densify_step`'s structure-agnostic moment reset and
    the orbax checkpoint path work unchanged.

    The reference has no trainer (training is its unbuilt roadmap item,
    reference README.md:17) — these are the upstream 3DGS rates its users
    would expect from a complete framework.
    """
    adam = functools.partial(optax.adam, b1=0.9, b2=0.999, eps=1e-15)
    pos_schedule = optax.exponential_decay(
        init_value=position_lr_init * scene_extent,
        transition_steps=position_lr_max_steps,
        decay_rate=position_lr_final / position_lr_init,
        end_value=position_lr_final * scene_extent,
    )
    transforms = {
        "pos": adam(pos_schedule),
        "sh": optax.chain(adam(sh_lr), _scale_sh_rest(sh_rest_div)),
        "op": adam(opacity_lr),
        "scale": adam(scale_lr),
        "quat": adam(quat_lr),
        "time": adam(time_lr),
    }

    def labels(params: SceneParams) -> SceneParams:
        return SceneParams(
            positions="pos",
            sh="sh",
            raw_opacity="op",
            raw_scales="scale",
            quats="quat",
            # None is an empty subtree: static scenes need no label.
            time_params=None if params.time_params is None else "time",
        )

    return optax.multi_transform(transforms, labels)


def reset_opacity(params: SceneParams, opt_state=None, ceiling: float = 0.01):
    """The 3DGS recipe's periodic opacity reset (every ~3k steps upstream):
    clamp every splat's opacity to at most ``ceiling`` so floaters die and
    only data-supported splats re-grow. With ``opt_state`` given, the
    opacity Adam moments are zeroed too (upstream resets the optimizer
    state for the clamped tensor — stale momentum would instantly undo the
    clamp); ``raw_opacity`` is SceneParams' only (N,) float leaf, which is
    how its moments are identified structure-agnostically in any optax
    state (plain adam or multi_transform). Returns ``params`` or
    ``(params, opt_state)``."""
    eps = 1e-6
    c = min(max(ceiling, eps), 1.0 - eps)
    raw_ceiling = jnp.float32(jnp.log(c / (1.0 - c)))
    params = params._replace(
        raw_opacity=jnp.minimum(params.raw_opacity, raw_ceiling)
    )
    if opt_state is None:
        return params
    n = params.raw_opacity.shape[0]

    def reset(leaf):
        if (
            hasattr(leaf, "shape")
            and leaf.shape == (n,)
            and jnp.issubdtype(leaf.dtype, jnp.floating)
        ):
            return jnp.zeros_like(leaf)
        return leaf

    return params, jax.tree_util.tree_map(reset, opt_state)


def _emission_terms(scene_like, cam, tcfg: RenderConfig, time_value=None):
    """Exact emission accounting of the training path for one view:
    ``(needed, visible)`` where ``needed`` is the Σ valid·w·h tile-rect
    total (the diff path emits exactly the rect area per splat —
    ``build_sorted_instances``/``render.py`` — so ``needed > capacity``
    IFF instances were truncated) and ``visible`` is ``proj.valid``, the
    upstream ``update_filter`` (radii>0) visibility mask."""
    from gaussianrenderer_tpu.ops.projection import (
        preprocess_gaussians,
        slice_spacetime,
    )

    s, extra = slice_spacetime(scene_like, time_value)
    proj = preprocess_gaussians(
        s, cam, width=tcfg.width, height=tcfg.height,
        tile_w=tcfg.tile_w, tile_h=tcfg.tile_h, tiles_x=tcfg.tiles_x,
        tiles_y=tcfg.tiles_y, sh_degree=tcfg.sh_degree,
        extra_opacity_scale=extra,
        quantize_centers=tcfg.quantize_centers,
        ewa_dilation=tcfg.ewa_dilation,
        ewa_compensate=tcfg.ewa_compensate,
    )
    w = proj.tile_max[:, 0] - proj.tile_min[:, 0] + 1
    h = proj.tile_max[:, 1] - proj.tile_min[:, 1] + 1
    needed = jnp.sum(jnp.where(proj.valid, w * h, 0))
    return needed, proj.valid


@functools.lru_cache(maxsize=None)
def _capacity_probe(tcfg: RenderConfig):
    """Module-level jit probe cache keyed on the (frozen, hashable)
    training config — :func:`calibrate_capacity` runs after every densify
    episode, and a per-call closure would recompile the N-scale preprocess
    graph each time."""

    @jax.jit
    def probe(prepared, cam, time_value=None):
        return _emission_terms(prepared, cam, tcfg, time_value)[0]

    return probe


def calibrate_capacity(
    params: "SceneParams | object",
    views,
    cfg: RenderConfig,
    headroom: float = 1.5,
) -> RenderConfig:
    """Size ``cfg.instance_multiplier`` to the probed per-view instance
    totals instead of the safe-for-anything 8× default.

    Every instance-scale cost of the training path (expansion cumsums,
    the (tile,depth) sort, the feature gather and its scatter-add
    transpose) is paid at the STATIC capacity, so a 500k-splat scene
    whose views emit ~0.9M instances wastes 4.6× on the default. The
    probe is one jit per distinct camera of cheap N-scale column math
    (preprocess + tile-rect counts — no expansion); ``headroom`` guards
    pose drift between probes. Returns a new config (capacity is static;
    callers re-jit on change, which :func:`fit_scene` does
    automatically after densify episodes)."""
    scene = params.to_scene() if hasattr(params, "to_scene") else params
    prepared = scene.prepared() if hasattr(scene, "prepared") else scene
    probe = _capacity_probe(_training_config(cfg))

    worst = 0
    for view in views:
        cam = view[0]
        tv = jnp.float32(view[2]) if len(view) > 2 else None
        worst = max(worst, int(probe(prepared, cam, tv)))
    n = scene.num_gaussians
    mult = max(worst * headroom / max(n, 1), 1.0)
    return dataclasses.replace(cfg, instance_multiplier=mult)


def _make_step_fn(cfg, optimizer, loss_fn, *, timed: bool, densify: bool):
    """THE jit train-step body, shared by :func:`make_train_step` and
    :func:`fit_scene` (one implementation, four fixed arities — each
    (timed, densify) combination gets its own jit entry point; a single
    mixed-arity function is the recompile trap render.py:214 documents).

    ``densify=True`` prepends a :class:`DensifyState` operand/result and
    differentiates the loss w.r.t. an all-zeros NDC probe as well — the
    probe gradient IS the view-space positional gradient upstream 3DGS
    keys adaptive density control on (DensifyState docstring). The
    densify step additionally returns the view's exact emission total
    (``needed``, a device scalar): the render truncates silently past the
    static capacity, so :func:`fit_scene` compares ``needed`` against
    ``cfg.instance_capacity`` and re-calibrates — truncation is never
    silent (project rule)."""

    @jax.jit
    def step_fn(params: SceneParams, opt_state, *rest):
        if densify:
            dstate, cam, target = rest[0], rest[1], rest[2]
            extra = (rest[3],) if timed else ()
        else:
            cam, target = rest[0], rest[1]
            extra = (rest[2],) if timed else ()
        if densify:
            probe = jnp.zeros((2, params.positions.shape[0]), jnp.float32)
            loss, (grads, view_grads) = jax.value_and_grad(
                lambda p, pr: loss_fn(
                    p, cam, target, cfg, *extra, ndc_probe=pr
                ),
                argnums=(0, 1),
            )(params, probe)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, cam, target, cfg, *extra
            )
        if densify:
            # Cheap N-scale re-projection (no expansion): the exact
            # emission total for the capacity check, and proj.valid —
            # upstream's update_filter (radii>0) — so denom counts
            # PROJECTED steps, including occluded-with-zero-gradient
            # ones (a splat visible once in 200 steps must not score as
            # if that one gradient were its mean).
            needed, visible = _emission_terms(
                params.to_scene(), cam, _training_config(cfg),
                extra[0] if extra else None,
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if densify:
            dstate = accumulate_densify_stats(dstate, view_grads, visible)
            return params, opt_state, dstate, loss, needed
        return params, opt_state, loss

    return step_fn


def make_train_step(cfg: RenderConfig, optimizer=None, loss_fn=None,
                    timed: bool = False):
    """Single-chip jit train step: Adam against a target frame.

    ``loss_fn(params, cam, target, cfg[, time_value], ndc_probe=None)``
    defaults to :func:`mse_loss`; pass :func:`l1_dssim_loss` for the
    standard 3DGS photometric loss. With ``timed=True`` the step
    signature gains a traced ``time_value`` operand — ``(params,
    opt_state, cam, target, time_value)`` — for fitting spacetime scenes
    to time-stamped targets."""
    optimizer = optimizer or make_optimizer()
    loss_fn = loss_fn or mse_loss
    step = _make_step_fn(cfg, optimizer, loss_fn, timed=timed, densify=False)
    return step, optimizer


# --------------------------------------------------------------- multi-chip
def make_multichip_train_step(cfg: RenderConfig, mesh, optimizer=None,
                              strip_bounds=None, with_stats: bool = False):
    """Mesh-parallel train step: params sharded over Gaussians, loss computed
    strip-parallel, gradients land on the owning chip via the AD transpose
    of the forward all_gather.

    ``strip_bounds`` (a static tuple from
    ``parallel.balance_strips_for_scene``) load-balances the strip
    decomposition exactly like ``render_frame_multichip``: each chip runs
    the max strip height but owns only its boundary rows; its target
    region is dynamic-sliced from the replicated padded target and the
    loss masks rows outside the owned range.

    With ``with_stats=True`` the step returns ``(params, opt_state, loss,
    overflow)`` where ``overflow`` is the mesh-reduced per-strip instance
    truncation flag — a truncated strip silently biases the loss and every
    gradient, so callers that size capacity tightly (``fit_scene``) must
    see it (truncation is never silent, project rule)."""
    from gaussianrenderer_tpu.parallel.multichip import (
        AXIS,
        _strip_render,
        strip_geometry,
    )

    optimizer = optimizer or make_optimizer()
    d = mesh.shape[AXIS]
    if strip_bounds is None:
        strip_diffs = strip_rows_max = None
        if cfg.tiles_y % d != 0:
            raise ValueError(
                f"tiles_y={cfg.tiles_y} must be divisible by the mesh "
                f"size {d} (or pass balanced strip_bounds)"
            )
    else:
        strip_bounds = tuple(int(b) for b in strip_bounds)
        # Validates monotonicity too — decreasing bounds would silently
        # double-count rows in the psum'd loss.
        strip_diffs, strip_rows_max = strip_geometry(
            strip_bounds, d, cfg.tiles_y
        )
    train_cfg = _training_config(cfg)

    def loss_fn(params: SceneParams, cam: CameraParams, target):
        capacity = train_cfg.instance_capacity(params.positions.shape[0]) // d

        def shard_body(p_shard, cam_rep, target_in):
            fb_strip, overflow, _ = _strip_render(
                p_shard.to_scene(),
                cam_rep,
                cfg=train_cfg,
                num_devices=d,
                capacity=capacity,
                compositor="diff",
                time_value=None,
                with_stats=True,
                strip_bounds=strip_bounds,
            )
            h = fb_strip.shape[1]
            chip = jax.lax.axis_index(AXIS)
            if strip_bounds is None:
                # Equal strips: target arrives strip-sharded; mask pad
                # rows beyond the real framebuffer height.
                row0 = chip * h
                target_local = target_in[:, :h, :]
                rows_valid = (row0 + jnp.arange(h)) < cfg.height
            else:
                # Balanced strips: target arrives replicated and padded
                # past the deepest possible slice; each chip slices its
                # owned region and masks rows beyond it.
                y0 = jnp.asarray(strip_bounds[:-1], jnp.int32)[chip]
                rows_here = jnp.asarray(strip_diffs, jnp.int32)[chip]
                row0 = y0 * cfg.tile_h
                target_local = jax.lax.dynamic_slice(
                    target_in,
                    (0, row0, 0),
                    (3, h, target_in.shape[2]),
                )
                rows_valid = (jnp.arange(h) < rows_here * cfg.tile_h) & (
                    (row0 + jnp.arange(h)) < cfg.height
                )
            err = (fb_strip - target_local) ** 2
            err = err * rows_valid[None, :, None]
            overflow = jax.lax.pmax(overflow.astype(jnp.int32), AXIS) > 0
            return jax.lax.psum(jnp.sum(err), AXIS), overflow

        target_spec = (
            P(None, AXIS, None) if strip_bounds is None else P()
        )
        fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(
                jax.tree_util.tree_map(lambda _: P(AXIS), params),
                jax.tree_util.tree_map(lambda _: P(), cam),
                target_spec,
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        if strip_bounds is not None:
            # Pad so the deepest slice (last boundary at max strip height)
            # stays in range — dynamic_slice must never clamp, or the
            # row masks would drift off their true offsets.
            need_h = (cfg.tiles_y + strip_rows_max) * cfg.tile_h
            target = jnp.pad(
                target, ((0, 0), (0, need_h - target.shape[1]), (0, 0))
            )
        total_px = 3 * cfg.height * cfg.width
        err_sum, overflow = fn(params, cam, target)
        return err_sum / total_px, overflow

    @functools.partial(jax.jit)
    def train_step(params, opt_state, cam, target_strips):
        (loss, overflow), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cam, target_strips
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if with_stats:
            return params, opt_state, loss, overflow
        return params, opt_state, loss

    return train_step, optimizer


def pad_target_for_mesh(target: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """Pad a (3, H, W) target's rows up to the full tile grid so strip
    sharding gets equal-height strips; pad rows are loss-masked."""
    full_h = cfg.tiles_y * cfg.tile_h
    pad_h = full_h - target.shape[1]
    return jnp.pad(target, ((0, 0), (0, pad_h), (0, 0)))


def pad_params_for_mesh(params: SceneParams, multiple: int) -> SceneParams:
    """Pad the trainable N up to a multiple of the mesh size (shard_map's
    Gaussian-axis sharding needs equal shards — ``shard_scene`` does the
    same for inference scenes). Pad rows are INERT splats: raw_opacity
    −30 (sigmoid ≈ 9e−14, below every alpha threshold, so they render
    nothing and receive exactly zero gradient — Adam leaves them frozen),
    unit quats, ~1e−9 world-unit scales. A naive zero-pad would be wrong:
    raw_opacity 0 is opacity 0.5."""
    n = params.positions.shape[0]
    n_pad = -(-n // multiple) * multiple
    if n_pad == n:
        return params
    pad = n_pad - n

    def _pad(x, fill=0.0):
        if x is None:
            return None
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    return SceneParams(
        positions=_pad(params.positions),
        sh=_pad(params.sh),
        raw_opacity=_pad(params.raw_opacity, -30.0),
        raw_scales=_pad(params.raw_scales, -20.0),
        quats=_pad(params.quats).at[n:, 0].set(1.0),
        time_params=_pad(params.time_params),
    )


# ------------------------------------------------- adaptive density control
class DensifyState(NamedTuple):
    """Accumulated densification statistics (a jax pytree, leading dim N).

    Mirrors the 3DGS adaptive-density-control bookkeeping: the mean
    VIEW-SPACE positional gradient magnitude since the last densify step
    decides who clones/splits. View-space = dL/d(NDC center), obtained
    as the gradient of an all-zeros NDC probe (projection.py
    ``ndc_probe``) — the exact quantity upstream 3DGS accumulates as
    ``means2D`` grads, so ``densify_step``'s paper-default threshold
    (2e-4) keeps its upstream meaning at any scene scale. ``denom``
    counts only the steps a splat was visible (nonzero view gradient),
    matching upstream's ``update_filter`` denominator."""

    grad_accum: jnp.ndarray  # (N,) Σ ‖∂L/∂(NDC center)‖ over steps
    denom: jnp.ndarray  # (N,) f32 — steps the splat was visible
    steps: jnp.ndarray  # () int32 — steps accumulated

    @classmethod
    def zero(cls, n: int) -> "DensifyState":
        return cls(
            grad_accum=jnp.zeros((n,), jnp.float32),
            denom=jnp.zeros((n,), jnp.float32),
            steps=jnp.int32(0),
        )


def accumulate_densify_stats(
    state: DensifyState,
    view_grads: jnp.ndarray,
    visible: Optional[jnp.ndarray] = None,
) -> DensifyState:
    """Fold one train step's view-space gradient norms into the state
    (call inside the jit train step — pure elementwise column math).

    ``view_grads``: (2, N) dL/d(NDC center) — the gradient of the zero
    NDC probe threaded through the loss (see ``_make_step_fn``).
    ``visible``: (N,) bool projected-this-view mask (upstream 3DGS's
    ``update_filter = radii > 0``); without it, visibility falls back to
    "nonzero gradient", which over-scores splats occluded (zero gradient,
    exactly — the T_EPS gate zeroes their weights) in most of their
    projected views."""
    gx, gy = view_grads[0], view_grads[1]
    norm = jnp.sqrt(gx * gx + gy * gy)
    seen = (norm > 0.0) if visible is None else visible
    return DensifyState(
        grad_accum=state.grad_accum + norm,
        denom=state.denom + seen.astype(jnp.float32),
        steps=state.steps + 1,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "grad_threshold", "prune_opacity", "split_scale_pct", "prune_scale"
    ),
)
def densify_step(
    params: SceneParams,
    opt_state,
    state: DensifyState,
    *,
    grad_threshold: float = 2e-4,
    prune_opacity: float = 5e-3,
    split_scale_pct: float = 0.75,
    prune_scale: Optional[float] = None,
    seed: int = 0,  # vary per episode (e.g. the step index) or every
    # episode draws the SAME eps pattern per slot — a donor recycled in
    # consecutive episodes resamples identical relative offsets
) -> Tuple[SceneParams, object, DensifyState, dict]:
    """One adaptive-density-control episode under a FIXED splat budget.

    The 3DGS recipe (prune low-opacity splats; CLONE small high-gradient
    splats, SPLIT large ones) re-expressed without shape growth: pruned
    splats become free slots, and each free slot is refilled from the
    highest-mean-gradient donor — sampled inside the donor's own Gaussian
    with scales shrunk by 1/1.6 (the paper's split), while the donor
    keeps its position but also shrinks when it is a "large" splat
    (split) and stays unchanged when "small" (clone). Matching donors to
    slots is ONE descending-score ``lax.sort`` plus one N-scale gather —
    fine here because densification runs once per a few hundred steps
    (the frame loop's no-gather rule does not apply to episodic work).

    The Adam moments of refilled slots are reset to zero via the same
    masked scatter, so respawned splats do not inherit stale momentum.

    Returns (params, opt_state, reset stats, info) where info carries
    device scalars: number of recycled slots, donors above threshold.
    """
    n = params.positions.shape[0]
    opacity = jax.nn.sigmoid(params.raw_opacity)
    dead = opacity < prune_opacity
    # Upstream 3DGS additionally prunes world-space-oversized splats
    # (gaussian_model.py prune: scale > 0.1 × camera extent): without it
    # an unconstrained background splat can balloon across the scene —
    # measured as a flat-color wall at held-out poses in the capture
    # demo. ``prune_scale`` is that absolute world-units threshold
    # (fit_scene passes prune_scale_ratio × camera-rig extent).
    if prune_scale is not None:
        dead = dead | (
            jnp.max(jnp.exp(params.raw_scales), axis=1) > prune_scale
        )
    score = state.grad_accum / jnp.maximum(state.denom, 1.0)
    eligible = (~dead) & (score > grad_threshold)

    # Donor ranking: descending score over eligible splats. One sort.
    rank_key = jnp.where(eligible, -score, jnp.float32(jnp.inf))
    _, donor_idx = jax.lax.sort(
        (rank_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    # Free-slot ranking: dead slots first (their order is irrelevant).
    slot_key = jnp.where(dead, jnp.int32(0), jnp.int32(1))
    _, slot_idx = jax.lax.sort(
        (slot_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    n_dead = jnp.sum(dead.astype(jnp.int32))
    n_eligible = jnp.sum(eligible.astype(jnp.int32))
    # Refill every dead slot while there are donors, but let one donor
    # seed at most 4 slots (a donor spread over many samples degrades
    # into noise; 4 matches one clone + a 3-way split).
    n_recycle = jnp.minimum(n_dead, 4 * n_eligible)

    # Pair slot r with donor (r mod n_eligible): when free slots outnumber
    # donors the strongest donors take several slots (multi-split).
    r = jnp.arange(n, dtype=jnp.int32)
    donor_of_slot = donor_idx[r % jnp.maximum(n_eligible, 1)]
    take = r < n_recycle  # only the first n_recycle slots refill

    # Scatter map: target[slot_idx[r]] <- donor params (modified) for
    # taken slots. Build per-slot source index then one stacked gather.
    src = jnp.where(take, donor_of_slot, slot_idx)  # identity when not taken

    # Permute the "write where" into natural order: refill[i] = True iff
    # slot i is among the taken ones; source_of[i] = donor for slot i.
    refill = jnp.zeros((n,), bool).at[slot_idx].set(take)
    source_of = jnp.zeros((n,), jnp.int32).at[slot_idx].set(src)
    source_of = jnp.where(refill, source_of, r)

    # Split-vs-clone by donor extent: "large" donors (world-space max
    # scale above the scene median) get the paper's split treatment.
    scales = jnp.exp(params.raw_scales)
    max_scale = jnp.max(scales, axis=1)
    split_cut = jnp.nanquantile(
        jnp.where(dead, jnp.nan, max_scale), split_scale_pct
    )
    is_split_donor = max_scale >= split_cut

    def g1(a):  # row gather by source_of
        return a[source_of]

    key_arr = jax.random.PRNGKey(seed)
    eps = jax.random.normal(key_arr, (n, 3), jnp.float32)
    donor_scales = g1(scales)
    donor_quats = g1(params.quats)
    # Sample inside the donor's Gaussian: x = p + R·(s ⊙ ε). Using the
    # normalized quat rotation keeps the sample aligned with the donor's
    # principal axes (the paper samples from the donor PDF).
    qn = donor_quats / jnp.maximum(
        jnp.linalg.norm(donor_quats, axis=1, keepdims=True), 1e-8
    )
    w, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    sx = donor_scales * eps
    rx = jnp.stack(
        [
            (1 - 2 * (y * y + z * z)) * sx[:, 0]
            + 2 * (x * y - w * z) * sx[:, 1]
            + 2 * (x * z + w * y) * sx[:, 2],
            2 * (x * y + w * z) * sx[:, 0]
            + (1 - 2 * (x * x + z * z)) * sx[:, 1]
            + 2 * (y * z - w * x) * sx[:, 2],
            2 * (x * z - w * y) * sx[:, 0]
            + 2 * (y * z + w * x) * sx[:, 1]
            + (1 - 2 * (x * x + y * y)) * sx[:, 2],
        ],
        axis=1,
    )
    shrink = jnp.where(g1(is_split_donor), jnp.float32(1.0 / 1.6), 1.0)

    new_positions = jnp.where(
        refill[:, None], g1(params.positions) + rx, params.positions
    )
    new_scales_raw = jnp.where(
        refill[:, None],
        g1(params.raw_scales) + jnp.log(shrink)[:, None],
        params.raw_scales,
    )
    new_sh = jnp.where(refill[:, None], g1(params.sh), params.sh)
    new_quats = jnp.where(refill[:, None], donor_quats, params.quats)
    new_raw_op = jnp.where(
        refill, g1(params.raw_opacity), params.raw_opacity
    )
    # Split donors themselves shrink too (the paper replaces one large
    # splat by TWO smaller samples; the donor is the second sample).
    # Scatter only the refilled rows' donors (identity rows would race
    # a False write into donor slots under duplicate indices).
    donor_scatter_idx = jnp.where(refill, source_of, jnp.int32(n))
    donor_was_used = (
        jnp.zeros((n,), bool).at[donor_scatter_idx].set(True, mode="drop")
    )
    donor_shrinks = donor_was_used & is_split_donor
    new_scales_raw = jnp.where(
        donor_shrinks[:, None],
        new_scales_raw + jnp.log(jnp.float32(1.0 / 1.6)),
        new_scales_raw,
    )

    new_time = (
        None
        if params.time_params is None
        else jnp.where(
            refill[:, None], g1(params.time_params), params.time_params
        )
    )
    new_params = SceneParams(
        positions=new_positions,
        sh=new_sh,
        raw_opacity=new_raw_op,
        raw_scales=new_scales_raw,
        quats=new_quats,
        time_params=new_time,
    )

    # Reset Adam moments on every refilled row (and the shrunk donors'
    # scale moments stay — only refills are hard resets).
    def reset_rows(leaf):
        if not hasattr(leaf, "shape") or leaf.shape[:1] != (n,):
            return leaf
        mask = refill.reshape((n,) + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, jnp.zeros_like(leaf), leaf)

    new_opt_state = jax.tree_util.tree_map(reset_rows, opt_state)

    info = {
        "recycled": n_recycle,
        "dead": n_dead,
        "eligible": n_eligible,
    }
    return new_params, new_opt_state, DensifyState.zero(n), info


def _drain_losses(pending, out) -> None:
    """Fetch a batch of device loss scalars in ONE transfer. fit_scene
    keeps per-step losses on device (a float() per step is a ~30 ms D2H
    sync on the dev tunnel — it would serialize step dispatch); stacking
    the pending scalars makes the periodic fetch one transfer instead of
    len(pending)."""
    if pending:
        import numpy as np

        out.extend(float(v) for v in np.asarray(jnp.stack(pending)))
        pending.clear()


def fit_scene(
    views,
    cfg: RenderConfig,
    params: SceneParams,
    *,
    steps: int = 1000,
    optimizer=None,
    loss_fn=None,
    densify_every: int = 0,
    densify_stop: float = 0.7,
    prune_scale_ratio: float = 0.1,
    opacity_reset_every: int = 0,
    sh_warmup_every: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    log_fn=None,
    log_every: int = 50,
    snapshot_fn=None,
    snapshot_every: int = 0,
    mesh=None,
    strip_bounds=None,
    auto_capacity: bool = True,
    resume_from: Optional[str] = None,
    zero_sh_rest: Optional[bool] = None,
):
    """The full 3DGS training loop as one supported call.

    ``views`` is a sequence of ``(CameraParams, target)`` pairs — or
    ``(CameraParams, target, time)`` triples for spacetime scenes (all
    views must agree) — cycled round-robin; ``target`` is a planar
    (3, H, W) float image like :func:`render_for_training` produces.
    Composes the pieces this module exposes individually: the jit
    Adam step with densify-stat accumulation, adaptive density control
    every ``densify_every`` steps until ``densify_stop·steps`` (upstream
    3DGS also stops ADC at half training), the periodic
    :func:`reset_opacity` clamp, and orbax checkpoints every
    ``checkpoint_every`` steps under ``checkpoint_dir/step_NNNNNN``.
    Defaults to :func:`make_3dgs_optimizer` with the position schedule
    horizon at ``steps``. Returns ``(params, history)`` where history
    carries the loss trajectory and per-episode densify info (device
    scalars already converted to Python ints/floats).

    ``snapshot_fn(step, params, loss)`` fires every ``snapshot_every``
    steps with the CURRENT trainable params — the hook behind live
    training monitors (``gr-fit --serve``, the ecosystem's
    remote-viewer analog): render a preview, push a metric, etc.
    Unlike ``log_fn`` it receives the params pytree, so keep it cheap
    or infrequent.

    With ``mesh`` (a ``parallel.make_mesh()`` device mesh, plus optional
    balanced ``strip_bounds``), the same loop runs mesh-parallel via
    :func:`make_multichip_train_step`: params are Gaussian-sharded onto
    the mesh (padded to the mesh size with inert splats and un-padded on
    return) and targets strip-padded automatically; ADC and timed views
    stay single-chip.

    ``sh_warmup_every`` is upstream 3DGS's ``oneupSHdegree`` schedule:
    rendering starts at SH degree 0 (DC color only) and the active
    degree rises by one every ``sh_warmup_every`` steps (upstream uses
    1000) up to ``cfg.sh_degree`` — base color settles before the
    view-dependent bands unlock, which keeps early densification from
    chasing specular noise. The bump fires BEFORE the step renders
    (upstream calls oneupSHdegree at the top of the iteration), so
    step ``sh_warmup_every`` is the first at degree 1. Bands above
    degree 0 are ZEROED at warmup start (upstream zero-inits
    features_rest), so a band that never unlocks (steps <
    sh_warmup_every·degree — warned) ships zero view-dependence, not
    init noise. Each bump re-jits the step (the degree is static in
    the compiled graph); 0 disables.

    ``resume_from`` restores a :func:`save_checkpoint` directory (the
    passed ``params`` is the shape template — same budget N) and
    continues from its recorded step: view cycling, densify/reset/
    checkpoint cadences, and the Adam position-lr decay (its count rides
    in the restored moments) all pick up where the saved run left off, so
    resume + remainder reproduces the uninterrupted run exactly.

    The reference never built its training roadmap item (reference
    README.md:17); this is the one-call form of the capability for users
    coming from upstream 3DGS trainers."""
    views = list(views)
    if not views:
        raise ValueError("fit_scene needs at least one (cam, target) view")
    arities = {len(v) for v in views}
    if len(arities) != 1 or arities - {2, 3}:
        raise ValueError("views must be all (cam, target) or all "
                         "(cam, target, time)")
    timed = arities == {3}
    optimizer = optimizer or make_3dgs_optimizer(position_lr_max_steps=steps)
    loss_fn = loss_fn or mse_loss

    if mesh is not None:
        # Mesh-parallel fit: params Gaussian-sharded, loss strip-parallel
        # (make_multichip_train_step). ADC/timed views stay single-chip —
        # densify's global sorts would all_gather the whole scene per
        # episode, defeating the sharding.
        if timed:
            raise ValueError("timed views are single-chip only (mesh=None)")
        if densify_every:
            raise ValueError("densify_every requires mesh=None")
        if sh_warmup_every:
            raise ValueError("sh_warmup_every requires mesh=None")
        if loss_fn is not mse_loss:
            raise ValueError(
                "mesh mode uses the strip-masked loss built into "
                "make_multichip_train_step; pass loss_fn=None"
            )
        from jax.sharding import NamedSharding, PartitionSpec

        from gaussianrenderer_tpu.parallel.multichip import AXIS

        d = mesh.shape[AXIS]
        n0 = params.positions.shape[0]
        params = pad_params_for_mesh(params, d)
        was_padded = params.positions.shape[0] != n0
        step_fn, optimizer = make_multichip_train_step(
            cfg, mesh, optimizer, strip_bounds, with_stats=True
        )
        sharding = NamedSharding(mesh, PartitionSpec(AXIS))
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), params
        )
        views = [(c, pad_target_for_mesh(t, cfg)) for c, t in views]
        opt_state = optimizer.init(params)
        start_step = 0
        if resume_from:
            # Sharded templates: orbax restores each array straight onto
            # its mesh shard (load_checkpoint docstring). A mesh-mode
            # checkpoint of a non-divisible scene holds the PADDED N.
            params, opt_state, _, start_step = load_checkpoint(
                resume_from, params, opt_state
            )
        losses, pending, overflow_events = [], [], []
        overflow_seen = None
        for s in range(start_step, steps):
            cam, target = views[s % len(views)]
            params, opt_state, loss, ovf = step_fn(
                params, opt_state, cam, target
            )
            # Device scalars only — a per-step float() host sync costs
            # ~30 ms on the dev tunnel and would serialize dispatch;
            # fetched in batches at log/end boundaries.
            pending.append(loss)
            overflow_seen = ovf if overflow_seen is None else \
                jnp.logical_or(overflow_seen, ovf)
            done = s + 1
            boundary = done % max(log_every, 1) == 0 or done == steps
            if boundary and overflow_seen is not None and bool(overflow_seen):
                # A truncated strip biased the loss and gradients; grow
                # the capacity and re-jit (never silent, project rule).
                overflow_events.append({"step": done, "capacity": int(
                    _training_config(cfg).instance_capacity(
                        params.positions.shape[0]) // d)})
                import warnings

                warnings.warn(
                    f"fit_scene(mesh): per-strip instance capacity "
                    f"exceeded by step {done}; growing "
                    f"instance_multiplier {cfg.instance_multiplier} -> "
                    f"{cfg.instance_multiplier * 1.5}", RuntimeWarning,
                )
                cfg = dataclasses.replace(
                    cfg,
                    instance_multiplier=cfg.instance_multiplier * 1.5,
                )
                step_fn, optimizer = make_multichip_train_step(
                    cfg, mesh, optimizer, strip_bounds, with_stats=True
                )
                overflow_seen = None
            if opacity_reset_every and done % opacity_reset_every == 0 \
                    and done < steps:
                params, opt_state = reset_opacity(params, opt_state)
            if checkpoint_dir and checkpoint_every and (
                done % checkpoint_every == 0 or done == steps
            ):
                import os

                save_checkpoint(
                    os.path.join(checkpoint_dir, f"step_{done:06d}"),
                    params, opt_state, step=done,
                )
            if boundary or (snapshot_fn and snapshot_every
                            and done % snapshot_every == 0):
                _drain_losses(pending, losses)
            if log_fn and done % max(log_every, 1) == 0:
                log_fn(done, losses[-1])
            if snapshot_fn and snapshot_every and done % snapshot_every == 0:
                snapshot_fn(done, params, losses[-1])
        _drain_losses(pending, losses)
        if was_padded:
            # Drop the inert pad rows; the slice re-lays-out the shards,
            # so a non-divisible scene comes back unsharded.
            params = jax.tree_util.tree_map(lambda x: x[:n0], params)
        return params, {"losses": losses, "densify": [],
                        "overflow": overflow_events}

    n = params.positions.shape[0]
    if (
        sh_warmup_every
        and not resume_from
        and params.sh.shape[1] > 3
        and zero_sh_rest is not False
    ):
        # Upstream 3DGS zero-inits features_rest; with the oneupSHdegree
        # warmup, bands that unlock late — or never, when
        # steps < sh_warmup_every·cfg.sh_degree — must not ship their
        # init noise in the output scene (ADVICE r3). Zeroing at warmup
        # start makes a permanently-locked band exactly upstream's
        # untrained state (zero view-dependence), not junk.
        #
        # ``zero_sh_rest`` (ADVICE r4): a caller FINE-TUNING a pretrained
        # scene (params loaded from a trained PLY, resume_from unset)
        # would silently lose all view-dependent color here. Default None
        # keeps the fresh-fit behavior but warns when the bands being
        # zeroed carry real signal; pass False to keep pretrained bands
        # (the warmup then only gates when they resume training) or True
        # to zero silently.
        if zero_sh_rest is None:
            import numpy as _zsr_np

            rest_mag = float(
                _zsr_np.max(_zsr_np.abs(_zsr_np.asarray(params.sh[:, 3:])))
            ) if n else 0.0
            if rest_mag > 1e-6:
                import warnings

                warnings.warn(
                    "fit_scene: sh_warmup_every is zeroing non-zero SH "
                    f"bands above degree 0 (max |coeff| {rest_mag:.3g}) — "
                    "a pretrained scene loses its view-dependent color. "
                    "Pass zero_sh_rest=False to keep the bands, or "
                    "zero_sh_rest=True to silence this warning.",
                    RuntimeWarning,
                )
        params = params._replace(sh=params.sh.at[:, 3:].set(0.0))
    if sh_warmup_every and steps < sh_warmup_every * cfg.sh_degree:
        import warnings

        warnings.warn(
            f"fit_scene: steps={steps} < sh_warmup_every"
            f"*sh_degree={sh_warmup_every * cfg.sh_degree}; SH bands "
            f"above degree {steps // sh_warmup_every} never unlock and "
            "stay zero (view-independent color on those bands)",
            RuntimeWarning,
        )
    opt_state = optimizer.init(params)
    dstate = DensifyState.zero(n)
    start_step = 0
    if resume_from:
        # Resume a save_checkpoint state: the freshly-initialized pytrees
        # above are the structure templates; the restored step continues
        # every cadence (views cycle, densify/reset/checkpoint schedules,
        # the Adam position-lr decay — its count rides in opt_state).
        try:
            params, opt_state, rd, start_step = load_checkpoint(
                resume_from, params, opt_state, dstate
            )
            dstate = rd if rd is not None else dstate
        except ValueError:
            # Checkpoint without densify accumulators (e.g. mesh-mode or
            # external): params + moments only.
            params, opt_state, _, start_step = load_checkpoint(
                resume_from, params, opt_state
            )
    if auto_capacity:
        # Probed instance capacity: the training step's instance-scale
        # costs (sort/gather/scatter) are paid at the static capacity,
        # and the safe-for-anything 8x default is typically 4-6x over
        # the real total (calibrate_capacity docstring). Probed AFTER a
        # resume — the restored splats are the ones that emit.
        cfg = calibrate_capacity(params, views, cfg)
    sh_target = cfg.sh_degree
    if sh_warmup_every:
        # oneupSHdegree warmup: the active degree is a pure function of
        # the step count, so a resume picks up the right band.
        cfg = dataclasses.replace(
            cfg, sh_degree=min(start_step // sh_warmup_every, sh_target)
        )
    step_fn = _make_step_fn(cfg, optimizer, loss_fn, timed=timed,
                            densify=True)
    # Upstream's size-prune threshold is relative to the camera rig's
    # extent (its cameras_extent): radius of the view-position cloud.
    prune_scale = None
    if prune_scale_ratio:
        import numpy as np

        cam_pos = np.stack([np.asarray(v[0].position) for v in views])
        rig = float(
            np.linalg.norm(cam_pos - cam_pos.mean(axis=0), axis=1).max()
        )
        prune_scale = prune_scale_ratio * (rig or 1.0)
    losses, pending, episodes, overflow_events = [], [], [], []
    capacity = _training_config(cfg).instance_capacity(n)
    needed_max = None  # device scalar: worst emission total since last check
    for s in range(start_step, steps):
        if (sh_warmup_every and cfg.sh_degree < sh_target
                and (s + 1) % sh_warmup_every == 0):
            # Unlock the next SH band BEFORE rendering this step:
            # upstream's oneupSHdegree fires at the top of iteration N
            # (1-based), so iteration sh_warmup_every renders at degree 1
            # (ADVICE r3 cadence fix). After the bump at step `done`,
            # the active degree equals done // sh_warmup_every — exactly
            # the resume formula min(start_step // sh_warmup_every, ·).
            cfg = dataclasses.replace(cfg, sh_degree=cfg.sh_degree + 1)
            step_fn = _make_step_fn(cfg, optimizer, loss_fn, timed=timed,
                                    densify=True)
        view = views[s % len(views)]
        if timed:
            cam, target, tv = view
            params, opt_state, dstate, loss, needed = step_fn(
                params, opt_state, dstate, cam, target, jnp.float32(tv)
            )
        else:
            cam, target = view
            params, opt_state, dstate, loss, needed = step_fn(
                params, opt_state, dstate, cam, target
            )
        # Device scalars only; fetched in batches at boundaries (a
        # per-step float() sync costs ~30 ms on the dev tunnel).
        pending.append(loss)
        needed_max = needed if needed_max is None else \
            jnp.maximum(needed_max, needed)
        done = s + 1
        episode = (
            densify_every
            and done % densify_every == 0
            and done <= densify_stop * steps
        )
        boundary = done % max(log_every, 1) == 0 or done == steps or episode
        if boundary and needed_max is not None:
            # The render truncates instances silently past the static
            # capacity — surface it (project rule) and, under
            # auto_capacity, grow + re-jit so gradients stop being biased.
            worst = int(needed_max)
            needed_max = None
            if worst > capacity:
                overflow_events.append(
                    {"step": done, "needed": worst, "capacity": capacity}
                )
                import warnings

                warnings.warn(
                    f"fit_scene: view emission {worst} exceeded instance "
                    f"capacity {capacity} by step {done}; "
                    + ("recalibrating" if auto_capacity else
                       "pass a larger cfg.instance_multiplier"),
                    RuntimeWarning,
                )
                if auto_capacity:
                    cfg = dataclasses.replace(
                        cfg,
                        instance_multiplier=worst * 1.5 / max(n, 1),
                    )
                    capacity = _training_config(cfg).instance_capacity(n)
                    step_fn = _make_step_fn(
                        cfg, optimizer, loss_fn, timed=timed, densify=True
                    )
        if episode:
            params, opt_state, dstate, info = densify_step(
                params, opt_state, dstate, seed=done,
                prune_scale=prune_scale,
            )
            episodes.append(
                {"step": done, **{k: int(v) for k, v in info.items()}}
            )
            if auto_capacity:
                # Clones/splits move mass — re-probe, grow-only (shrink
                # would churn recompiles for marginal savings).
                new_cfg = calibrate_capacity(params, views, cfg)
                if new_cfg.instance_capacity(n) > cfg.instance_capacity(n):
                    cfg = new_cfg
                    capacity = _training_config(cfg).instance_capacity(n)
                    step_fn = _make_step_fn(
                        cfg, optimizer, loss_fn, timed=timed, densify=True
                    )
        if opacity_reset_every and done % opacity_reset_every == 0 \
                and done < steps:
            params, opt_state = reset_opacity(params, opt_state)
        if checkpoint_dir and checkpoint_every and (
            done % checkpoint_every == 0 or done == steps
        ):
            import os

            save_checkpoint(
                os.path.join(checkpoint_dir, f"step_{done:06d}"),
                params, opt_state, dstate, step=done,
            )
        if boundary or (snapshot_fn and snapshot_every
                        and done % snapshot_every == 0):
            _drain_losses(pending, losses)
        if log_fn and done % max(log_every, 1) == 0:
            log_fn(done, losses[-1])
        if snapshot_fn and snapshot_every and done % snapshot_every == 0:
            snapshot_fn(done, params, losses[-1])
    _drain_losses(pending, losses)
    return params, {"losses": losses, "densify": episodes,
                    "overflow": overflow_events}


def dataset_image_shape(dataset_dir: str) -> Tuple[int, int]:
    """(height, width) of a capture dataset's images, without loading the
    dataset: COLMAP workspaces report the calibrated camera's size,
    ``transforms*.json`` datasets their meta ``h``/``w`` (or the first
    frame's image), ``poses.json`` datasets the first target image's. The
    one probe both ``gr-fit`` and ``gr-eval`` size their default render
    resolution from."""
    import json
    import os

    import numpy as np

    from gaussianrenderer_tpu.scene import blender, colmap

    if not os.path.isfile(os.path.join(dataset_dir, "poses.json")):
        if colmap.is_colmap_dir(dataset_dir):
            sparse = colmap.find_sparse_dir(dataset_dir)
            cam0 = next(iter(colmap.read_cameras_bin(
                os.path.join(sparse, "cameras.bin")
            ).values()))
            return int(cam0.height), int(cam0.width)
        if blender.is_blender_dir(dataset_dir):
            return blender.blender_image_shape(dataset_dir)
    with open(os.path.join(dataset_dir, "poses.json")) as fh:
        records = json.load(fh)
    if not records:
        raise ValueError(f"{dataset_dir}: poses.json has no views")
    tpath = os.path.join(dataset_dir, records[0]["target"])
    if tpath.endswith(".npy"):
        shape = np.load(tpath, mmap_mode="r").shape
    else:
        from PIL import Image

        shape = np.asarray(Image.open(tpath)).shape
    return int(shape[0]), int(shape[1])


def load_views(dataset_dir: str, cfg: RenderConfig, k_sigma: float = 3.0,
               stride: int = 1, split: Optional[str] = None):
    """Load a capture dataset directory into :func:`fit_scene` views.

    ``stride`` keeps every Nth view record (the membership of
    ``views[::stride]``), selected BEFORE any target is loaded — an eval
    split (``gr-eval --holdout-every N``) reads only its own images
    instead of decoding/uploading the whole dataset and discarding
    (N−1)/N of it.

    Format: ``poses.json`` — a list of records with ``c2w`` (3×4 or 4×4
    nested lists), ``target`` (filename), one of ``fov_y``/``fy``, and
    optional ``near``/``far``/``convention`` (default opencv/COLMAP) and
    ``time`` (making the view a timed triple). Targets are ``.npy``
    (H, W, 3) float or uint8 arrays, or image files when PIL is
    available. Every target must match ``cfg.height × cfg.width``;
    images are converted to the planar (3, H, W) float layout
    :func:`render_for_training` produces (row 0 at the image top →
    flipped into the framebuffer's bottom-up convention).

    COLMAP workspaces (``sparse/0/*.bin`` + ``images/`` — the standard
    3DGS capture layout) are detected and ingested directly via
    :mod:`gaussianrenderer_tpu.scene.colmap` when no ``poses.json``
    exists; pair with :func:`scene.colmap.init_from_points` for the
    upstream SfM-seeded initialization. Blender / NeRF-synthetic /
    instant-ngp / D-NeRF ``transforms*.json`` layouts are detected next
    (:mod:`gaussianrenderer_tpu.scene.blender`): ``split`` picks
    ``transforms_{split}.json`` explicitly (default: train split, then
    a splitless ``transforms.json``); RGBA targets composite over
    ``cfg.background`` (set it — the upstream ``--white_background``
    convention — so renders and targets agree on empty space); D-NeRF
    per-frame times make timed triples.

    The reference has no dataset ingestion (scenes only, via PLY
    drag-drop) — this is trainer-side surface for fitting real captures
    with :class:`Camera.from_pose <gaussianrenderer_tpu.scene.camera.Camera>`.
    """
    import json as _json
    import os

    import numpy as np

    from gaussianrenderer_tpu.scene.camera import Camera

    if not os.path.isfile(os.path.join(dataset_dir, "poses.json")):
        from gaussianrenderer_tpu.scene import colmap as _colmap

        if _colmap.is_colmap_dir(dataset_dir):
            if split is not None:
                raise ValueError(
                    "split= selects transforms_{split}.json and applies "
                    "only to Blender/NeRF-synthetic datasets; COLMAP "
                    "workspaces split by stride (llffhold)"
                )
            return _colmap.load_colmap(dataset_dir, cfg, k_sigma=k_sigma,
                                       stride=stride)
        from gaussianrenderer_tpu.scene import blender as _blender

        if _blender.is_blender_dir(dataset_dir):
            return _blender.load_blender(
                dataset_dir, cfg, k_sigma=k_sigma, stride=stride,
                split=split, background=cfg.background,
            )

    if split is not None:
        raise ValueError(
            "split= selects transforms_{split}.json and applies only to "
            "Blender/NeRF-synthetic datasets; poses.json datasets split "
            "by stride"
        )
    with open(os.path.join(dataset_dir, "poses.json")) as fh:
        records = _json.load(fh)
    views = []
    for rec in records[:: max(stride, 1)]:
        cam = Camera.from_pose(
            np.asarray(rec["c2w"], np.float32),
            fov_y_deg=rec.get("fov_y"),
            fy=rec.get("fy"),
            height=cfg.height,
            aspect=cfg.width / cfg.height,
            near=rec.get("near", 0.1),
            far=rec.get("far", 100.0),
            convention=rec.get("convention", "opencv"),
        )
        tpath = os.path.join(dataset_dir, rec["target"])
        if tpath.endswith(".npy"):
            img = np.load(tpath)
        else:
            from PIL import Image  # optional dep, image targets only

            img = np.asarray(Image.open(tpath))
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if (
            img.ndim != 3
            or img.shape[:2] != (cfg.height, cfg.width)
            or img.shape[2] < 3
        ):
            raise ValueError(
                f"{rec['target']}: expected ({cfg.height}, {cfg.width}, 3), "
                f"got {img.shape}"
            )
        # (H, W, 3) top-down image → planar (3, H, W) bottom-up target.
        target = jnp.asarray(
            img[::-1, :, :3].transpose(2, 0, 1), jnp.float32
        )
        if "time" in rec:
            views.append((cam.params(k_sigma), target, float(rec["time"])))
        else:
            views.append((cam.params(k_sigma), target))
    return views


def evaluate(params: Optional[SceneParams], views, cfg: RenderConfig,
             render_fn=None, per_view_fn=None):
    """Fit quality against held-out views: per-view and mean PSNR/SSIM.

    ``views`` uses the :func:`fit_scene` format — (cam, target) pairs or
    (cam, target, time) triples. Renders through the same differentiable
    path training sees (so numbers are the training objective's, not the
    packed inference path's), unless ``render_fn(cam, time_value) ->
    (3, H, W) framebuffer`` overrides the renderer (``gr-eval --path
    packed`` scores the deployed inference path this way; ``params`` may
    then be None). ``per_view_fn(i, fb, target, row)`` is called after
    each view's metrics (progress printing, PNG dumps). Returns a dict
    with ``psnr``/``ssim`` means and a ``per_view`` list."""
    rows = []
    for i, v in enumerate(views):
        cam, target = v[0], v[1]
        tv = jnp.float32(v[2]) if len(v) == 3 else None
        if render_fn is None:
            fb = render_for_training(params, cam, cfg, tv)
        else:
            fb = render_fn(cam, tv)
        mse = float(jnp.mean((fb - target) ** 2))
        row = {
            "psnr": 10.0 * math.log10(1.0 / max(mse, 1e-12)),
            "ssim": float(ssim(fb, target)),
        }
        rows.append(row)
        if per_view_fn is not None:
            per_view_fn(i, fb, target, row)
    if not rows:
        raise ValueError("evaluate: no views")
    return {
        "psnr": sum(r["psnr"] for r in rows) / len(rows),
        "ssim": sum(r["ssim"] for r in rows) / len(rows),
        "per_view": rows,
    }


# ------------------------------------------------------------- checkpointing
def save_checkpoint(
    path: str,
    params: SceneParams,
    opt_state=None,
    densify_state: Optional[DensifyState] = None,
    step: int = 0,
) -> None:
    """Checkpoint the full training state (params + Adam moments +
    densification accumulators) with orbax.

    The reference has no training, hence no training checkpoints (its
    only persistence is the PLY scene, SURVEY §5 — which ``save_ply``
    covers for inference handoff). This is the resume path for the
    training subsystem: orbax saves the pytree per-array, preserving
    shardings, so a multichip run (``make_multichip_train_step``) can
    checkpoint and restore without gathering to one host."""
    import orbax.checkpoint as ocp
    import os

    state = {"params": params, "step": jnp.int32(step)}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if densify_state is not None:
        state["densify"] = densify_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(
    path: str,
    params: SceneParams,
    opt_state=None,
    densify_state: Optional[DensifyState] = None,
):
    """Restore a :func:`save_checkpoint` state. The passed pytrees are
    structure/sharding TEMPLATES (e.g. freshly-initialized state at the
    same budget N): arrays are restored with the template's sharding,
    which is how a resumed multichip session lands parameters directly
    on their mesh shards. Returns ``(params, opt_state, densify, step)``
    with ``None`` for templates not supplied.

    Partial restores are supported: a checkpoint saved WITH optimizer /
    densify state restores params-only (inference handoff) — orbax's
    strict template restore rejects missing subtrees, so in that case the
    checkpoint is read structure-free and each requested component is
    remapped onto its template by key path (then device_put to the
    template's sharding)."""
    import orbax.checkpoint as ocp
    import os

    template = {"params": params, "step": jnp.int32(0)}
    if opt_state is not None:
        template["opt_state"] = opt_state
    if densify_state is not None:
        template["densify"] = densify_state
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    on_disk = set(ckptr.metadata(path).item_metadata.keys())
    if on_disk == set(template.keys()):
        restored = ckptr.restore(path, template)
    else:
        missing = set(template.keys()) - on_disk
        if missing:
            raise ValueError(
                f"checkpoint {path} has no {sorted(missing)} "
                f"(on disk: {sorted(on_disk)})"
            )
        # Template covers a strict subset: structure-free read + path
        # remap (orbax serializes NamedTuples as field-name dicts and
        # tuples as lists, so template key paths resolve directly).
        raw = ckptr.restore(path)

        def remap(raw_tree, tmpl):
            flat, treedef = jax.tree_util.tree_flatten_with_path(tmpl)
            leaves = []
            for kpath, tleaf in flat:
                node = raw_tree
                for k in kpath:
                    if isinstance(k, jax.tree_util.GetAttrKey):
                        node = node[k.name]
                    elif isinstance(k, jax.tree_util.DictKey):
                        node = node[k.key]
                    elif isinstance(k, jax.tree_util.SequenceKey):
                        node = node[k.idx]
                    else:  # FlattenedIndexKey etc.
                        raise TypeError(f"unsupported key {k!r}")
                if hasattr(tleaf, "sharding"):
                    node = jax.device_put(node, tleaf.sharding)
                leaves.append(node)
            return jax.tree_util.tree_unflatten(treedef, leaves)

        restored = {k: remap(raw[k], v) for k, v in template.items()}
    return (
        restored["params"],
        restored.get("opt_state"),
        restored.get("densify"),
        int(restored["step"]),
    )
