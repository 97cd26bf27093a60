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
"""

from __future__ import annotations

import dataclasses
import functools
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
    """Trainable pre-activation scene parameters (a jax pytree)."""

    positions: jnp.ndarray  # (N, 3)
    sh: jnp.ndarray  # (N, 3*(deg+1)^2)
    raw_opacity: jnp.ndarray  # (N,) logit-space
    raw_scales: jnp.ndarray  # (N, 3) log-space
    quats: jnp.ndarray  # (N, 4) unnormalized

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
            time_params=time_params,
        )


def _training_config(cfg: RenderConfig) -> RenderConfig:
    return dataclasses.replace(cfg, compositor="diff", quantize_centers=False)


def render_for_training(
    params: SceneParams, cam: CameraParams, cfg: RenderConfig
) -> jnp.ndarray:
    """Differentiable forward render of trainable parameters."""
    fb, _ = render_frame(params.to_scene(), cam, _training_config(cfg))
    return fb


def mse_loss(
    params: SceneParams, cam: CameraParams, target: jnp.ndarray, cfg: RenderConfig
) -> jnp.ndarray:
    fb = render_for_training(params, cam, cfg)
    return jnp.mean((fb - target) ** 2)


def make_optimizer(lr: float = 1e-2) -> optax.GradientTransformation:
    return optax.adam(lr)


def make_train_step(cfg: RenderConfig, optimizer=None):
    """Single-chip jit train step: Adam on MSE against a target frame."""
    optimizer = optimizer or make_optimizer()

    @jax.jit
    def train_step(params: SceneParams, opt_state, cam: CameraParams, target):
        loss, grads = jax.value_and_grad(mse_loss)(params, cam, target, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer


# --------------------------------------------------------------- multi-chip
def make_multichip_train_step(cfg: RenderConfig, mesh, optimizer=None):
    """Mesh-parallel train step: params sharded over Gaussians, loss computed
    strip-parallel, gradients land on the owning chip via the AD transpose
    of the forward all_gather."""
    from gaussianrenderer_tpu.parallel.multichip import AXIS, _strip_render

    optimizer = optimizer or make_optimizer()
    d = mesh.shape[AXIS]
    if cfg.tiles_y % d != 0:
        raise ValueError(f"tiles_y={cfg.tiles_y} must divide mesh size {d}")
    train_cfg = _training_config(cfg)

    def loss_fn(params: SceneParams, cam: CameraParams, target):
        capacity = train_cfg.instance_capacity(params.positions.shape[0]) // d

        def shard_body(p_shard, cam_rep, target_strip):
            fb_strip = _strip_render(
                p_shard.to_scene(),
                cam_rep,
                cfg=train_cfg,
                num_devices=d,
                capacity=capacity,
                compositor="diff",
                time_value=None,
            )
            h = fb_strip.shape[1]
            # Mask pad rows beyond the real framebuffer height so the
            # bottom strip's padding contributes no loss/gradient.
            chip = jax.lax.axis_index(AXIS)
            row0 = chip * h
            rows_valid = (row0 + jnp.arange(h)) < cfg.height
            err = (fb_strip - target_strip[:, :h, :]) ** 2
            err = err * rows_valid[None, :, None]
            return jax.lax.psum(jnp.sum(err), AXIS)

        fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(
                jax.tree_util.tree_map(lambda _: P(AXIS), params),
                jax.tree_util.tree_map(lambda _: P(), cam),
                P(None, AXIS, None),
            ),
            out_specs=P(),
            check_vma=False,
        )
        total_px = 3 * cfg.height * cfg.width
        return fn(params, cam, target) / total_px

    @functools.partial(jax.jit)
    def train_step(params, opt_state, cam, target_strips):
        loss, grads = jax.value_and_grad(loss_fn)(params, cam, target_strips)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer


def pad_target_for_mesh(target: jnp.ndarray, cfg: RenderConfig) -> jnp.ndarray:
    """Pad a (3, H, W) target's rows up to the full tile grid so strip
    sharding gets equal-height strips; pad rows are loss-masked."""
    full_h = cfg.tiles_y * cfg.tile_h
    pad_h = full_h - target.shape[1]
    return jnp.pad(target, ((0, 0), (0, pad_h), (0, 0)))
