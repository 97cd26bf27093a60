"""GEMM benchmark (reference ``matrix_test.cpp`` parity).

Times the blocked Pallas matmul and XLA ``jnp.dot`` at a given N (default
8192, as the reference), prints device name and TFLOP/s, and spot-checks
the Pallas result against the ones-fill closed form like
``matrix_test.cpp:111-124`` plus a full check vs ``jnp.dot``.
"""

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--bm", type=int, default=512)
    ap.add_argument("--bn", type=int, default=1024)
    ap.add_argument("--bk", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ones", action="store_true", help="ones-fill spot check")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussianrenderer_tpu.ops.pallas.matmul import matmul_pallas
    from gaussianrenderer_tpu.utils import device_time, measure_floor

    n = args.n
    d = jax.devices()[0]
    print(f"device: {d.device_kind} ({d.platform})", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    if args.ones:
        a = jnp.ones((n, n), dtype=jnp.bfloat16)
        b = jnp.ones((n, n), dtype=jnp.bfloat16)
    else:
        a = jax.random.normal(key, (n, n), dtype=jnp.bfloat16)
        b = jax.random.normal(key, (n, n), dtype=jnp.bfloat16)

    out = matmul_pallas(a, b, bm=args.bm, bn=args.bn, bk=args.bk)
    ref = jnp.dot(a, b, preferred_element_type=jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    ok = err / scale < 1e-2
    if args.ones:
        ok &= float(out[0, 0]) == float(n)
    print(f"correctness: max rel err {err/scale:.2e} -> {'OK' if ok else 'FAIL'}")

    floor = measure_floor()
    flops = 2.0 * n * n * n
    for name, fn in (
        ("pallas", lambda a, b: matmul_pallas(a, b, bm=args.bm, bn=args.bn, bk=args.bk)),
        ("xla_dot", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)),
    ):
        ms = device_time(fn, a, b, iters=args.iters, floor=floor)
        # flops/ms/1e9 = flops/(ms/1000)/1e12 = TFLOP/s (the reference
        # prints GFLOP/s, matrix_test.cpp:103-108 — at its 8192 default
        # and TPU speeds the readable unit is TFLOP/s).
        print(f"{name}: {ms:.3f} ms  {flops / ms / 1e9:.1f} TFLOP/s")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
