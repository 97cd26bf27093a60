"""Sort-component tests — the oracle-comparison pattern of the reference
harnesses (``radix_test.cpp``/``onesweep.cpp``: hand sort vs CUB)."""

import numpy as np
import jax.numpy as jnp

from gaussianrenderer_tpu.ops.sort import (
    is_nondecreasing,
    pack_key,
    radix_sort_u32,
    sort_packed,
    sort_two_key,
    unpack_key,
)


def _random_keys(n, seed=0, tile_bits=11):
    rng = np.random.default_rng(seed)
    tiles = jnp.asarray(rng.integers(0, 1 << tile_bits, n, dtype=np.int32))
    depths = jnp.asarray(
        rng.integers(0, 1 << (32 - tile_bits), n, dtype=np.uint32)
    )
    return tiles, depths


def test_pack_unpack_roundtrip():
    tiles, depths = _random_keys(1000)
    key = pack_key(tiles, depths, 21)
    t2, d2 = unpack_key(key, 21)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(tiles))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(depths))


def test_packed_sort_matches_two_key_oracle():
    for n in (1, 7, 1000, 50_000):
        tiles, depths = _random_keys(n, seed=n)
        vid = jnp.arange(n, dtype=jnp.int32)
        key = pack_key(tiles, depths, 21)
        kp, _ = sort_packed(key, vid)
        kh, kl, _ = sort_two_key(tiles, depths, vid)
        assert bool(is_nondecreasing(kp))
        np.testing.assert_array_equal(
            np.asarray(kp), np.asarray(pack_key(kh, kl, 21))
        )


def test_radix_composition_matches_monolithic():
    tiles, depths = _random_keys(20_000, seed=9)
    vid = jnp.arange(20_000, dtype=jnp.int32)
    key = pack_key(tiles, depths, 21)
    kp, vp = sort_packed(key, vid)
    kr, vr = radix_sort_u32(key, vid)
    np.testing.assert_array_equal(np.asarray(kr), np.asarray(kp))
    # stability: payloads must match exactly too (both sorts stable)
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(vp))


def test_radix_digit_width_independence():
    tiles, depths = _random_keys(5000, seed=3)
    key = pack_key(tiles, depths, 21)
    vid = jnp.arange(5000, dtype=jnp.int32)
    k8 = radix_sort_u32(key, vid, digit_bits=8)[0]
    k16 = radix_sort_u32(key, vid, digit_bits=16)[0]
    k4 = radix_sort_u32(key, vid, digit_bits=4)[0]
    np.testing.assert_array_equal(np.asarray(k8), np.asarray(k16))
    np.testing.assert_array_equal(np.asarray(k8), np.asarray(k4))


def test_pallas_block_sort_matches_lax_sort():
    """Experimental bitonic block sort (merge-sort phase 1) vs lax.sort."""
    from gaussianrenderer_tpu.ops.pallas.block_sort import ROWS, block_sort_runs

    rng = np.random.default_rng(0)
    run, c = 512, 2048
    x = jnp.asarray(rng.integers(0, 2**32, (ROWS, c), dtype=np.uint32))
    out = np.asarray(block_sort_runs(x, run=run))

    xs = np.asarray(x)
    for b in range(c // run):
        sl = slice(b * run, (b + 1) * run)
        order = np.argsort(xs[0, sl], kind="stable")
        np.testing.assert_array_equal(out[0, sl], xs[0, sl][order])
        # payload rows follow their keys (allow any order among equal keys,
        # which random u32 keys make vanishingly unlikely to occur)
        for r in range(1, ROWS):
            np.testing.assert_array_equal(out[r, sl], xs[r, sl][order])
