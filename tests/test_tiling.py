"""Unit tests for tile-instance expansion and the (tile, depth) sort.

The sort-oracle pattern mirrors the reference's OneSweep-vs-CUB harness
(SURVEY.md §4): our searchsorted/lax.sort machinery is validated against a
brute-force NumPy expansion + stable sort.
"""

import numpy as np
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.projection import ProjectedGaussians
from gaussianrenderer_tpu.ops.tiling import build_sorted_instances


def _make_proj(tmin, tmax, depth, valid):
    n = len(depth)
    z = np.zeros((n, 3), np.float32)
    return ProjectedGaussians(
        valid=jnp.asarray(valid),
        depth=jnp.asarray(depth, dtype=jnp.float32),
        color=jnp.asarray(z),
        opacity=jnp.ones(n, jnp.float32),
        center_px=jnp.zeros((n, 2), jnp.float32),
        conic=jnp.asarray(z),
        aabb_px=jnp.zeros((n, 4), jnp.float32),
        tile_min=jnp.asarray(tmin, dtype=jnp.int32),
        tile_max=jnp.asarray(tmax, dtype=jnp.int32),
    )


def _oracle_expand(tmin, tmax, depth, valid, tiles_x, depth_scale=1e6):
    recs = []
    for g in range(len(depth)):
        if not valid[g]:
            continue
        d = np.uint32(np.float32(depth[g]) * np.float32(depth_scale))
        for ty in range(tmin[g][1], tmax[g][1] + 1):
            for tx in range(tmin[g][0], tmax[g][0] + 1):
                recs.append((tx + ty * tiles_x, int(d), g))
    recs.sort(key=lambda r: (r[0], r[1]))
    return recs


def test_expansion_matches_bruteforce():
    rng = np.random.default_rng(0)
    n, tiles_x, tiles_y = 40, 5, 4
    tmin_x = rng.integers(0, tiles_x, n)
    tmax_x = np.minimum(tmin_x + rng.integers(0, 3, n), tiles_x - 1)
    tmin_y = rng.integers(0, tiles_y, n)
    tmax_y = np.minimum(tmin_y + rng.integers(0, 3, n), tiles_y - 1)
    tmin = np.stack([tmin_x, tmin_y], 1)
    tmax = np.stack([tmax_x, tmax_y], 1)
    depth = rng.uniform(1.0, 50.0, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.2

    proj = _make_proj(tmin, tmax, depth, valid)
    out = build_sorted_instances(
        proj, tiles_x=tiles_x, num_tiles=tiles_x * tiles_y, capacity=1024
    )
    expected = _oracle_expand(
        list(map(tuple, tmin)), list(map(tuple, tmax)), depth, valid, tiles_x
    )
    total = int(out.total_instances)
    assert total == len(expected)
    assert not bool(out.overflow)

    got_tiles = np.asarray(out.tile_id)[:total]
    got_ids = np.asarray(out.gaussian_id)[:total]
    exp_tiles = np.array([r[0] for r in expected])
    np.testing.assert_array_equal(got_tiles, exp_tiles)

    # Within a tile, instances must be depth-ascending (front-to-back).
    depth_q = (depth * 1e6).astype(np.uint32)
    for t in np.unique(exp_tiles):
        mask = got_tiles == t
        dq = depth_q[got_ids[mask]]
        assert np.all(np.diff(dq.astype(np.int64)) >= 0)

    # Per-tile ranges bound exactly the tile's instances.
    starts = np.asarray(out.tile_start)
    counts = np.asarray(out.tile_count)
    for t in range(tiles_x * tiles_y):
        seg = got_tiles[starts[t] : starts[t] + counts[t]]
        assert np.all(seg == t)
    assert counts.sum() == total


def test_overflow_detection():
    tmin = [[0, 0]] * 10
    tmax = [[3, 3]] * 10  # 16 tiles each => 160 instances
    depth = np.linspace(1, 2, 10).astype(np.float32)
    proj = _make_proj(tmin, tmax, depth, np.ones(10, bool))
    out = build_sorted_instances(proj, tiles_x=4, num_tiles=16, capacity=64)
    assert bool(out.overflow)
    assert int(out.total_instances) == 160
    # Ranges stay within capacity.
    assert int(np.asarray(out.tile_count).sum()) <= 64


def test_invalid_gaussians_emit_nothing():
    tmin = [[0, 0], [1, 1]]
    tmax = [[1, 1], [2, 2]]
    proj = _make_proj(tmin, tmax, [5.0, 7.0], [False, False])
    out = build_sorted_instances(proj, tiles_x=4, num_tiles=16, capacity=128)
    assert int(out.total_instances) == 0
    assert int(np.asarray(out.tile_count).sum()) == 0
