"""PLY scene I/O.

Loader parity with the reference streaming parser
(``src/core/utils/gaussians.cpp:32-142`` and its CUDA twin
``src/core/cuda/misc.cu:13-135``):

* header scan for ``format`` / ``element vertex N`` / ``property`` lines,
* property-name dispatch (``x y z``, ``nxx ny nz`` [sic], ``f_dc_0..2``,
  ``f_rest_*``, ``opacity``, ``scale_*``, ``rot_*``; unknown → skipped),
* ``binary_little_endian 1.0`` only (ascii rejected),
* activations baked in at load: ``opacity = sigmoid(raw)``,
  ``scale = exp(raw)`` (``gaussians.cpp:25-26``),
* ``f_rest_j`` kept only for ``j < 3*((deg+1)^2 - 1)`` (reference: j < 24,
  i.e. degree 2; we default to the same and optionally accept degree 3).

Implementation is vectorized NumPy (single ``np.frombuffer`` + column
gather) rather than a per-value scalar loop, with an optional native C++
fast path (``gaussianrenderer_tpu.native``). A writer is also provided (the
reference has no writer; SURVEY.md §5 "checkpoint/resume: none").
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gaussianrenderer_tpu.scene.gaussians import GaussianScene

_PLY_DTYPES = {
    "float": ("<f4", 4),
    "float32": ("<f4", 4),
    "double": ("<f8", 8),
    "float64": ("<f8", 8),
    "uchar": ("u1", 1),
    "uint8": ("u1", 1),
    "char": ("i1", 1),
    "int8": ("i1", 1),
    "short": ("<i2", 2),
    "int16": ("<i2", 2),
    "ushort": ("<u2", 2),
    "uint16": ("<u2", 2),
    "int": ("<i4", 4),
    "int32": ("<i4", 4),
    "uint": ("<u4", 4),
    "uint32": ("<u4", 4),
}


def _parse_header(f) -> Tuple[str, int, List[Tuple[str, str]], int]:
    """Returns (format, num_vertices, [(type, name)...], header_end_offset)."""
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file (missing 'ply' magic)")
    fmt = ""
    num = -1
    props: List[Tuple[str, str]] = []
    in_vertex_element = False
    while True:
        raw = f.readline()
        if not raw:
            raise ValueError("unexpected EOF in PLY header")
        line = raw.decode("ascii", errors="replace").strip()
        if line == "end_header":
            break
        if line.startswith("comment"):
            continue
        if line.startswith("format "):
            fmt = line[len("format ") :]
        elif line.startswith("element "):
            parts = line.split()
            in_vertex_element = parts[1] == "vertex"
            if in_vertex_element:
                num = int(parts[2])
        elif line.startswith("property ") and in_vertex_element:
            parts = line.split()
            if parts[1] == "list":
                raise ValueError("list properties are not supported")
            props.append((parts[1], parts[2]))
    return fmt, num, props, f.tell()


def load_ply(
    path: str,
    max_sh_degree: Optional[int] = 2,
    use_native: bool = True,
) -> GaussianScene:
    """Load a 3DGS PLY into a device-resident ``GaussianScene``.

    ``max_sh_degree`` 2 matches the reference exactly (24 rest coefficients,
    ``gaussians.cpp:95``); 3 additionally keeps ``f_rest_24..44``; ``None``
    loads the file's own stored degree (the highest complete SH band its
    ``f_rest`` properties cover, capped at 3) — what editing/eval tools
    want, so a degree-3 trained scene is neither truncated nor a degree-2
    scene zero-padded and mislabeled as degree 3.
    """
    # Spacetime (4D) files carry extra per-splat time properties; the
    # native fast path doesn't know them, so sniff the header first and
    # route 4D files through the NumPy path (one vectorized read either
    # way — 4D captures are also typically much smaller than statics).
    has_time = False
    try:
        with open(path, "rb") as f:
            _, _, props, _ = _parse_header(f)
        pnames = {name for _, name in props}
        has_time = bool(pnames & {"t_center", "trbf_center"})
        if max_sh_degree is None:
            # The file's own stored degree: the highest complete band its
            # f_rest properties cover (standard 3DGS files carry 0/9/24/45
            # rest coefficients for degrees 0-3), capped at 3.
            n_rest = sum(1 for n in pnames if n.startswith("f_rest_"))
            max_sh_degree = next(
                d for d in (3, 2, 1, 0)
                if 3 * ((d + 1) ** 2 - 1) <= n_rest
            )
    except Exception:
        if max_sh_degree is None:
            max_sh_degree = 2  # unreadable header: the parse below reports

    arrays = None
    time_params = None
    if use_native and not has_time:
        try:
            from gaussianrenderer_tpu.native import ply_native

            arrays = ply_native.load(path, max_sh_degree)
        except Exception:
            arrays = None
    if arrays is None:
        arrays, time_params = _load_ply_numpy(path, max_sh_degree)
    positions, sh, opacity, scales, quats = arrays
    return GaussianScene(
        positions=jnp.asarray(positions),
        sh=jnp.asarray(sh),
        opacity=jnp.asarray(opacity),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        time_params=None if time_params is None else jnp.asarray(time_params),
    )


def _load_ply_numpy(path: str, max_sh_degree: int):
    with open(path, "rb") as f:
        fmt, num, props, offset = _parse_header(f)
        if fmt != "binary_little_endian 1.0":
            # Reference rejects anything else (gaussians.cpp:135-141).
            raise ValueError(f"unsupported PLY format: {fmt!r}")
        dtype = np.dtype(
            [(f"p{i}", _PLY_DTYPES[t][0]) for i, (t, _) in enumerate(props)]
        )
        data = np.fromfile(f, dtype=dtype, count=num)
    if data.shape[0] != num:
        raise ValueError(
            f"PLY body truncated: expected {num} vertices, got {data.shape[0]}"
        )

    name_to_col: Dict[str, int] = {name: i for i, (_, name) in enumerate(props)}

    def col(name: str, default: Optional[float] = None) -> np.ndarray:
        if name in name_to_col:
            return np.ascontiguousarray(
                data[f"p{name_to_col[name]}"], dtype=np.float32
            )
        if default is None:
            raise ValueError(f"PLY missing required property {name!r}")
        return np.full(num, default, dtype=np.float32)

    positions = np.stack([col("x"), col("y"), col("z")], axis=1)

    n_rest = 3 * ((max_sh_degree + 1) ** 2 - 1)
    sh = np.zeros((num, 3 + n_rest), dtype=np.float32)
    for c in range(3):
        sh[:, c] = col(f"f_dc_{c}", 0.0)
    for j in range(n_rest):
        sh[:, 3 + j] = col(f"f_rest_{j}", 0.0)

    # Load-time activations (reference gaussians.cpp:25-26).
    raw_opacity = col("opacity", 0.0)
    opacity = 1.0 / (1.0 + np.exp(-raw_opacity))
    scales = np.exp(
        np.stack([col("scale_0", 0.0), col("scale_1", 0.0), col("scale_2", 0.0)], axis=1)
    )
    quats = np.stack([col(f"rot_{i}", 1.0 if i == 0 else 0.0) for i in range(4)], axis=1)

    # Optional spacetime (4D) fields. Two namings are accepted:
    # ours (t_center, t_sigma, vx, vy, vz — written by save_ply) and the
    # SpacetimeGaussians convention (trbf_center, trbf_scale [log-stored],
    # motion_0..2 = linear velocity term of its polynomial trajectory).
    time_params = None
    if "t_center" in name_to_col:
        tc = col("t_center")
        ts = col("t_sigma", 0.1)
        fields = [tc, ts]
        if "vx" in name_to_col:
            fields += [col("vx", 0.0), col("vy", 0.0), col("vz", 0.0)]
        time_params = np.stack(fields, axis=1)
    elif "trbf_center" in name_to_col:
        tc = col("trbf_center")
        ts = np.exp(col("trbf_scale", np.log(0.1)))
        fields = [tc, ts]
        if "motion_0" in name_to_col:
            fields += [col(f"motion_{i}", 0.0) for i in range(3)]
        time_params = np.stack(fields, axis=1)

    return (positions, sh, opacity, scales, quats), time_params


def save_ply(scene: GaussianScene, path: str) -> None:
    """Write a scene back to a reference-compatible binary PLY.

    Inverts the load-time activations (logit of opacity, log of scale) so a
    round trip reproduces the on-disk convention of standard 3DGS files.
    Spacetime scenes additionally write ``t_center, t_sigma`` (+``vx, vy,
    vz`` for (N, 5) motion params) — raw, no activation; ``load_ply``
    reads these back (and also accepts the SpacetimeGaussians
    ``trbf_center/trbf_scale/motion_*`` naming for external files).
    """
    positions = np.asarray(scene.positions, dtype=np.float32)
    sh = np.asarray(scene.sh, dtype=np.float32)
    opacity = np.asarray(scene.opacity, dtype=np.float32)
    scales = np.asarray(scene.scales, dtype=np.float32)
    quats = np.asarray(scene.quats, dtype=np.float32)
    tp = (
        None
        if scene.time_params is None
        else np.asarray(scene.time_params, dtype=np.float32)
    )
    n = positions.shape[0]
    n_rest = sh.shape[1] - 3

    eps = 1e-7
    op = np.clip(opacity, eps, 1.0 - eps)
    raw_opacity = np.log(op / (1.0 - op))
    raw_scales = np.log(np.maximum(scales, 1e-30))

    names = (
        ["x", "y", "z", "nxx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    if tp is not None:
        names += ["t_center", "t_sigma"] + (
            ["vx", "vy", "vz"] if tp.shape[1] >= 5 else []
        )
    body = np.zeros((n, len(names)), dtype="<f4")
    body[:, 0:3] = positions
    body[:, 6:9] = sh[:, :3]
    body[:, 9 : 9 + n_rest] = sh[:, 3:]
    body[:, 9 + n_rest] = raw_opacity
    body[:, 10 + n_rest : 13 + n_rest] = raw_scales
    body[:, 13 + n_rest : 17 + n_rest] = quats
    if tp is not None:
        body[:, 17 + n_rest : 17 + n_rest + tp.shape[1]] = tp

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        body.tofile(f)


def load_scene(path: str, **kwargs) -> GaussianScene:
    """Extension-dispatched scene load: ``.gsz`` (compact quantized
    container), ``.splat`` (the antimatter15 web-viewer format — both in
    :mod:`gaussianrenderer_tpu.scene.compact`) or PLY — the one entry
    point viewer drag-drop uses, so every format is drop-loadable
    (reference accepts PLY only, ``canvas.cpp:280-296``)."""
    if path.endswith(".splat"):
        from gaussianrenderer_tpu.scene.compact import load_splat

        scene = load_splat(path)
        max_deg = kwargs.pop("max_sh_degree", None)
        if kwargs:
            raise TypeError(f"unsupported .splat load options: {kwargs}")
        if max_deg is not None:
            keep = 3 * (max_deg + 1) ** 2
            if keep < scene.sh.shape[1]:
                scene = scene._replace(sh=scene.sh[:, :keep])
        return scene
    if path.endswith(".gsz"):
        from gaussianrenderer_tpu.scene.compact import load_compact

        scene = load_compact(path)
        max_deg = kwargs.pop("max_sh_degree", None)
        if kwargs:
            raise TypeError(f"unsupported .gsz load options: {kwargs}")
        if max_deg is not None:  # same truncation semantics as load_ply
            keep = 3 * (max_deg + 1) ** 2
            if keep < scene.sh.shape[1]:
                scene = scene._replace(sh=scene.sh[:, :keep])
        return scene
    return load_ply(path, **kwargs)


def make_surface_scene(
    num: int,
    seed: int = 0,
    sh_degree: int = 1,
    spacetime: bool = False,
) -> GaussianScene:
    """Recognizable parametric-surface scene (demo/oracle geometry).

    ``make_clustered_scene`` reproduces trained-capture *statistics* but
    looks like colored fog; this generator samples splats ON surfaces —
    a checkerboard ground plane, a hue-shaded sphere, a torus, and a
    box — each splat flattened along the local surface normal and
    oriented to it (the disk-on-surface structure optimized 3DGS scenes
    converge to), so renders show crisp occlusion and silhouettes.
    Useful as a legible fit target and for demo media.
    """
    rng = np.random.default_rng(seed)
    # Budget split: ground 35%, sphere 25%, torus 25%, box 15%.
    n_g = int(num * 0.35)
    n_s = int(num * 0.25)
    n_t = int(num * 0.25)
    n_b = num - n_g - n_s - n_t

    def checker(u, v):
        c = ((np.floor(u * 2) + np.floor(v * 2)) % 2)[:, None]
        return c * np.array([[0.88, 0.86, 0.82]]) + (1 - c) * np.array(
            [[0.22, 0.25, 0.3]]
        )

    # Ground plane y=0, |x|,|z| ≤ 3.2.
    gx = rng.uniform(-3.2, 3.2, n_g)
    gz = rng.uniform(-3.2, 3.2, n_g)
    p_g = np.stack([gx, np.zeros(n_g), gz], 1)
    n_gn = np.tile([0.0, 1.0, 0.0], (n_g, 1))
    c_g = checker(gx, gz)

    # Sphere r=0.85 at (-1.15, 0.85, 0.1): hue from the normal.
    d = rng.normal(size=(n_s, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p_s = np.array([-1.15, 0.85, 0.1]) + 0.85 * d
    c_s = 0.5 + 0.45 * d  # smooth RGB from the unit normal
    n_sn = d

    # Torus R=0.72 r=0.28 at (1.25, 0.62, 0.35), axis +y.
    u = rng.uniform(0, 2 * np.pi, n_t)
    v = rng.uniform(0, 2 * np.pi, n_t)
    ring = np.stack([np.cos(u), np.zeros(n_t), np.sin(u)], 1)
    n_tn = (
        np.cos(v)[:, None] * ring
        + np.sin(v)[:, None] * np.tile([0.0, 1.0, 0.0], (n_t, 1))
    )
    p_t = np.array([1.25, 0.62, 0.35]) + 0.72 * ring + 0.28 * n_tn
    c_t = np.stack(
        [0.85 + 0.1 * np.cos(u), 0.35 + 0.2 * np.sin(2 * u),
         0.25 + 0.1 * np.sin(u)], 1
    )

    # Box 0.9×1.0×0.9 at (0.05, 0.5, -1.45): uniform faces, flat colors.
    face = rng.integers(0, 6, n_b)
    ax, sgn = face // 2, (face % 2) * 2.0 - 1.0
    uv = rng.uniform(-0.5, 0.5, (n_b, 2))
    p_b = np.zeros((n_b, 3))
    n_bn = np.zeros((n_b, 3))
    n_bn[np.arange(n_b), ax] = sgn
    half = np.array([0.45, 0.5, 0.45])
    for a in range(3):
        m = ax == a
        others = [i for i in range(3) if i != a]
        p_b[m, a] = sgn[m] * half[a]
        p_b[m, others[0]] = uv[m, 0] * 2 * half[others[0]]
        p_b[m, others[1]] = uv[m, 1] * 2 * half[others[1]]
    p_b += np.array([0.05, 0.5, -1.45])
    face_colors = np.array(
        [[0.9, 0.55, 0.2], [0.9, 0.55, 0.2], [0.3, 0.7, 0.4],
         [0.25, 0.45, 0.85], [0.35, 0.65, 0.8], [0.35, 0.65, 0.8]]
    )
    c_b = face_colors[face]

    pos = np.concatenate([p_g, p_s, p_t, p_b]).astype(np.float32)
    nrm = np.concatenate([n_gn, n_sn, n_tn, n_bn]).astype(np.float32)
    col = np.concatenate([c_g, c_s, c_t, c_b]).astype(np.float32)

    # Tangent disk size from surface area per splat (contiguous cover):
    # total area ≈ 41 + 9.1 + 8.0 + 5.2 ≈ 63 units².
    area = np.array([40.96, 9.08, 7.96, 5.22])
    per = [n_g, n_s, n_t, n_b]
    s_tan = np.concatenate(
        [np.full(k, 1.6 * math.sqrt(a / max(k, 1))) for a, k in zip(area, per)]
    ).astype(np.float32)
    s_tan *= rng.uniform(0.7, 1.4, num).astype(np.float32)
    scales = np.stack([s_tan, s_tan, 0.12 * s_tan], 1)  # flat along normal

    # Quaternion rotating local +z onto the surface normal: axis = z×n.
    z = np.array([0.0, 0.0, 1.0])
    axis = np.cross(np.tile(z, (num, 1)), nrm)
    s_ = np.linalg.norm(axis, axis=1)
    w = 1.0 + nrm @ z  # 2·cos²(θ/2)
    quats = np.concatenate([w[:, None], axis], 1)
    flip = s_ < 1e-6  # n ≈ ±z: identity or any 180° tangent flip
    quats[flip] = np.where(
        nrm[flip, 2:3] > 0, [1.0, 0, 0, 0], [0.0, 1, 0, 0]
    )
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)

    n_coeff = (sh_degree + 1) ** 2
    sh = np.zeros((num, 3 * n_coeff), np.float32)
    sh[:, :3] = (col - 0.5) / 0.28209479177387814

    time_params = None
    if spacetime:
        # Rigid per-OBJECT motion (legible, unlike per-splat noise): the
        # sphere drifts +x, the torus −x, the box rises; the ground is
        # static and always-on. Objects fade in/out on staggered windows.
        obj = np.concatenate(
            [np.full(n_g, 0), np.full(n_s, 1), np.full(n_t, 2),
             np.full(n_b, 3)]
        )
        vel_table = np.array(
            [[0.0, 0.0, 0.0], [1.1, 0.0, 0.3], [-1.0, 0.0, -0.3],
             [0.0, 0.9, 0.0]], np.float32
        )
        tc_table = np.array([0.5, 0.3, 0.5, 0.7], np.float32)
        ts_table = np.array([10.0, 0.22, 0.22, 0.22], np.float32)
        time_params = np.concatenate(
            [tc_table[obj][:, None], ts_table[obj][:, None],
             vel_table[obj]], axis=1
        ).astype(np.float32)

    return GaussianScene(
        positions=jnp.asarray(pos),
        sh=jnp.asarray(sh),
        opacity=jnp.asarray(np.full(num, 0.92, np.float32)),
        scales=jnp.asarray(scales.astype(np.float32)),
        quats=jnp.asarray(quats.astype(np.float32)),
        time_params=None if time_params is None
        else jnp.asarray(time_params),
    )


def make_clustered_scene(
    num: int,
    seed: int = 0,
    extent: float = 2.0,
    sh_degree: int = 2,
    spacetime: bool = False,
) -> GaussianScene:
    """Realistic synthetic scene matching trained-3DGS statistics.

    ``make_random_scene`` fills a uniform cube, which no optimized 3DGS
    scene resembles; this generator mimics the published structure of
    MipNeRF-360-style reconstructions (the scenes the reference was
    validated on, reference README.md:23):

    * **surface clustering** — splats concentrate on object surfaces and a
      ground plane, with a sparse far background shell (foreground/
      background split typical of unbounded captures);
    * **log-normal scale distribution** with a heavy tail — most splats
      are small, a few are huge (these drive the wide instance tiers);
    * **flattened anisotropy** — surface splats are disks (one axis
      shrunk ~5-10×), the known behavior of optimized covariances;
    * **bimodal opacity** — optimization pushes opacities toward 0 or 1.
    """
    rng = np.random.default_rng(seed)
    n_ground = int(num * 0.35)
    n_shell = int(num * 0.15)
    n_obj = num - n_ground - n_shell

    # Object clusters: anisotropic blobs scattered over the ground patch.
    k = max(4, min(24, num // 2000))
    centers = rng.uniform(-0.7 * extent, 0.7 * extent, size=(k, 3))
    centers[:, 1] = rng.uniform(-0.2 * extent, 0.5 * extent, size=k)
    cluster_id = rng.integers(0, k, size=n_obj)
    cluster_scale = rng.uniform(0.08, 0.3, size=(k, 3)) * extent
    pos_obj = centers[cluster_id] + rng.normal(
        size=(n_obj, 3)
    ) * cluster_scale[cluster_id]

    # Ground plane patch with small height noise.
    pos_gnd = np.stack(
        [
            rng.uniform(-extent, extent, size=n_ground),
            -0.4 * extent + rng.normal(0.0, 0.01 * extent, size=n_ground),
            rng.uniform(-extent, extent, size=n_ground),
        ],
        axis=1,
    )

    # Sparse far background shell (unbounded-capture periphery).
    u = rng.normal(size=(n_shell, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
    pos_sh = u * rng.uniform(2.5, 6.0, size=(n_shell, 1)) * extent

    positions = np.concatenate([pos_obj, pos_gnd, pos_sh]).astype(np.float32)

    # Log-normal scales; background splats bigger; surface splats flattened.
    # Tuned so a ~1080p view from z≈2·extent lands the published trained-3DGS
    # screen profile: median splat ≲1 tile (32px), a lognormal tail into the
    # hundreds-of-tiles range, and only ~0.01% beyond 1024 tiles (trained
    # scenes regularize scale; splats the size of the screen get pruned
    # during optimization).
    base = np.exp(rng.normal(np.log(0.005 * extent), 0.55, size=(num, 1)))
    base[n_obj + n_ground :] *= 4.0  # background shell: large fuzzy splats
    np.clip(base, None, 0.12 * extent, out=base)
    aniso = np.exp(rng.normal(0.0, 0.35, size=(num, 3)))
    scales = (base * aniso).astype(np.float32)
    flat_axis = rng.integers(0, 3, size=num)
    flatten = rng.uniform(0.1, 0.35, size=num)
    scales[np.arange(num), flat_axis] *= flatten.astype(np.float32)

    # Bimodal opacity (trained scenes pile up near 0 and 1).
    hi = rng.random(num) < 0.55
    logits = np.where(hi, rng.normal(2.0, 1.0, num), rng.normal(-2.5, 1.0, num))
    opacity = (1.0 / (1.0 + np.exp(-logits))).astype(np.float32)

    n_coeff = (sh_degree + 1) ** 2
    sh = np.zeros((num, 3 * n_coeff), dtype=np.float32)
    palette = rng.uniform(-1.2, 1.2, size=(k + 2, 3))
    which = np.concatenate(
        [cluster_id, np.full(n_ground, k), np.full(n_shell, k + 1)]
    )
    sh[:, :3] = (palette[which] + rng.normal(0.0, 0.25, size=(num, 3))).astype(
        np.float32
    )
    if n_coeff > 1:
        sh[:, 3:] = rng.normal(0.0, 0.12, size=(num, 3 * (n_coeff - 1))).astype(
            np.float32
        )

    quats = rng.normal(size=(num, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    time_params = None
    if spacetime:
        # (t_center, t_sigma, vx, vy, vz): temporal opacity window plus
        # per-splat linear motion, sliced by ops/projection.slice_spacetime
        # (p(t) = p + v*(t - t_center)); velocities sized so a splat moves
        # a visible fraction of the scene extent over t in [0, 1].
        t_centers = rng.uniform(0.0, 1.0, size=num).astype(np.float32)
        t_sigmas = rng.uniform(0.05, 0.3, size=num).astype(np.float32)
        vel = rng.normal(0.0, 0.08 * extent, size=(num, 3)).astype(np.float32)
        time_params = np.concatenate(
            [np.stack([t_centers, t_sigmas], axis=1), vel], axis=1
        )
    return GaussianScene(
        positions=jnp.asarray(positions),
        sh=jnp.asarray(sh),
        opacity=jnp.asarray(opacity),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        time_params=None if time_params is None else jnp.asarray(time_params),
    )


def make_random_scene(
    num: int,
    seed: int = 0,
    extent: float = 2.0,
    sh_degree: int = 2,
    scale_range: Tuple[float, float] = (0.01, 0.12),
    spacetime: bool = False,
) -> GaussianScene:
    """Synthetic scene generator for tests and benchmarks."""
    rng = np.random.default_rng(seed)
    positions = rng.uniform(-extent, extent, size=(num, 3)).astype(np.float32)
    n_coeff = (sh_degree + 1) ** 2
    sh = np.zeros((num, 3 * n_coeff), dtype=np.float32)
    # DC around mid-grey with color variation; higher bands smaller.
    sh[:, :3] = rng.normal(0.0, 1.0, size=(num, 3)).astype(np.float32)
    if n_coeff > 1:
        sh[:, 3:] = rng.normal(0.0, 0.15, size=(num, 3 * (n_coeff - 1))).astype(
            np.float32
        )
    opacity = rng.uniform(0.05, 0.95, size=num).astype(np.float32)
    scales = rng.uniform(*scale_range, size=(num, 3)).astype(np.float32)
    quats = rng.normal(size=(num, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    time_params = None
    if spacetime:
        # (t_center, t_sigma, vx, vy, vz) — see make_clustered_scene.
        centers = rng.uniform(0.0, 1.0, size=num).astype(np.float32)
        sigmas = rng.uniform(0.05, 0.3, size=num).astype(np.float32)
        vel = rng.normal(0.0, 0.08 * extent, size=(num, 3)).astype(np.float32)
        time_params = np.concatenate(
            [np.stack([centers, sigmas], axis=1), vel], axis=1
        )
    return GaussianScene(
        positions=jnp.asarray(positions),
        sh=jnp.asarray(sh),
        opacity=jnp.asarray(opacity),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        time_params=None if time_params is None else jnp.asarray(time_params),
    )
