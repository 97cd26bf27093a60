"""Structure-of-arrays Gaussian scene container.

The reference stores the scene as a device array of fat AoS ``Gaussian``
structs (``src/core/utils/gaussians.hpp:16-30``) whose derived fields are
overwritten in place each frame.  On TPU the scene is an immutable SoA pytree
(HBM-resident jnp arrays); per-frame derived quantities live in the render
step's functional dataflow instead of being written back.

Activations are baked in at load exactly like the reference
(``gaussians.cpp:25-26``): ``opacity = sigmoid(raw)``, ``scale = exp(raw)``.

SH layout parity note: the reference stores ``f_rest_j`` at ``sh[3 + j]`` and
its SH evaluation reads ``sh[3*coeff + channel]`` (``render.cu:506-530``), i.e.
it treats the PLY's rest coefficients as interleaved (coefficient-major,
RGB-adjacent).  We reproduce that layout: ``sh`` is ``(N, (deg+1)^2 * 3)`` with
``sh[:, 3*c + ch]`` = coefficient ``c`` of channel ``ch``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class GaussianScene(NamedTuple):
    """SoA 3D Gaussian scene (a jax pytree; every leaf has leading dim N).

    Fields mirror the persistent part of the reference ``Gaussian`` struct
    (``gaussians.hpp:16-30``); per-frame derived members (aabb, px center,
    radix id, camera-space XYZ, inv_covar) are intentionally absent.
    """

    positions: jnp.ndarray  # (N, 3) world xyz
    sh: jnp.ndarray  # (N, 3*(deg+1)^2) interleaved SH coefficients
    opacity: jnp.ndarray  # (N,) post-sigmoid
    scales: jnp.ndarray  # (N, 3) post-exp
    quats: jnp.ndarray  # (N, 4) w,x,y,z (unnormalized; normalized at use)
    #: Optional time parameters for 4D spacetime Gaussians: (N, 2) holding
    #: (t_center, t_sigma) for temporal opacity only, or (N, 5) adding a
    #: world-space velocity (vx, vy, vz) for position slicing
    #: p(t) = p + v·(t − t_center). None for static scenes (reference
    #: roadmap item, README.md:16).
    time_params: Optional[jnp.ndarray] = None

    @property
    def num_gaussians(self) -> int:
        return self.positions.shape[0]

    @property
    def sh_degree(self) -> int:
        n_coeff = self.sh.shape[1] // 3
        return int(round(n_coeff**0.5)) - 1

    @property
    def is_spacetime(self) -> bool:
        return self.time_params is not None

    def to_device(self) -> "GaussianScene":
        return jax.tree_util.tree_map(jnp.asarray, self)

    def pad_to(self, capacity: int) -> "GaussianScene":
        """Pad to a static capacity with fully-transparent Gaussians.

        Padding splats have opacity 0 so they never contribute; this lets a
        jit cache be reused across scenes of different size (bucketed N).
        """
        n = self.num_gaussians
        if capacity < n:
            raise ValueError(f"capacity {capacity} < scene size {n}")
        if capacity == n:
            return self
        pad = capacity - n

        def _pad(x):
            if x is None:
                return None
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        out = GaussianScene(
            positions=_pad(self.positions),
            sh=_pad(self.sh),
            opacity=_pad(self.opacity),
            scales=_pad(self.scales),
            quats=_pad(self.quats).at[n:, 0].set(1.0),
            time_params=_pad(self.time_params),
        )
        return out

    def reorder(self, order: jnp.ndarray) -> "GaussianScene":
        return jax.tree_util.tree_map(lambda x: x[order], self)

    def prepared(self) -> "PreparedScene":
        """Device-resident render-layout scene (see :class:`PreparedScene`)."""
        return PreparedScene(
            pos_t=jnp.asarray(self.positions, jnp.float32).T,
            sh_t=jnp.asarray(self.sh, jnp.float32).T,
            opacity=jnp.asarray(self.opacity, jnp.float32),
            scale_t=jnp.asarray(self.scales, jnp.float32).T,
            quat_t=jnp.asarray(self.quats, jnp.float32).T,
            time_params=(
                None
                if self.time_params is None
                else jnp.asarray(self.time_params, jnp.float32)
            ),
        )

    def morton_sorted(self) -> "GaussianScene":
        """Reorder splats along a 3D Morton curve of their positions.

        The reference lists Morton ordering as its next planned optimization
        (README.md:14). Spatial locality means splats that land in the same
        screen tile are adjacent in memory, improving gather locality in the
        sort/composite stages.
        """
        codes = morton_codes(np.asarray(self.positions))
        order = jnp.asarray(np.argsort(codes, kind="stable"))
        return self.reorder(order)


class PreparedScene(NamedTuple):
    """Render-layout scene: the (N, small) SoA transposed ONCE at setup.

    Column slices of a lane-minor (N, 3)/(N, 27) array are catastrophic on
    TPU (each slice re-reads the whole padded buffer), so the render math
    works on (small, N) rows (PERF_NOTES.md). Transposing per frame inside
    the jit costs ~6 ms at 3M splats (the SH block alone is 324 MB); this
    container holds the transposed arrays device-resident so a session
    (make_renderer / Canvas / bench) pays the relayout once per scene.
    ``render_frame`` accepts either form; GaussianScene.prepared() builds it.
    """

    pos_t: jnp.ndarray  # (3, N)
    sh_t: jnp.ndarray  # (3*(deg+1)^2, N)
    opacity: jnp.ndarray  # (N,)
    scale_t: jnp.ndarray  # (3, N)
    quat_t: jnp.ndarray  # (4, N)
    time_params: Optional[jnp.ndarray] = None  # (N, 2)

    @property
    def num_gaussians(self) -> int:
        return self.opacity.shape[0]

    @property
    def is_spacetime(self) -> bool:
        return self.time_params is not None


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of x so there are two zero bits between each."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_codes(positions: np.ndarray, bits: int = 21) -> np.ndarray:
    """64-bit Morton (Z-order) codes for world positions (host-side, NumPy).

    Non-finite positions (exploded splats are routine in real trained
    PLYs; the render path culls them) are parked deterministically at the
    low corner and excluded from the bounding box — a plain min/max would
    turn ONE NaN splat into NaN bounds and collapse the entire ordering.
    """
    pos = np.asarray(positions, dtype=np.float64)
    finite = np.isfinite(pos).all(axis=1)
    fin = pos[finite] if finite.any() else np.zeros((1, 3))
    lo = fin.min(axis=0)
    hi = fin.max(axis=0)
    extent = np.maximum(hi - lo, 1e-12)
    scale = (2**bits - 1) / extent
    pos = np.where(finite[:, None], pos, lo)
    q = np.clip((pos - lo) * scale, 0, 2**bits - 1).astype(np.uint64)
    return (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << np.uint64(1))
        | (_part1by2(q[:, 2]) << np.uint64(2))
    )
