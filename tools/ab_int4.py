"""Probe whether XLA on v5e runs int4 matmuls at the 2x-int8 MXU rate for
the stage-1 contraction shape — and at what cost the one-hot operand can be
materialized outside Pallas. Decides whether an int4 stage 1 is worth a
kernel rewrite."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

M, K, N = 1024, 128, 1 << 22
ITERS = 8


def bench(name, f, *args):
    try:
        t0 = time.time()
        np.asarray(f(*args))
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(f(*args))
            ts.append(time.time() - t0)
        dt = min(ts) / ITERS
        rate = 2 * M * K * N / dt
        print("%-24s %8.4fs/iter  %8.3g ops/s (compile %.1fs)"
              % (name, dt, rate, tc), flush=True)
    except Exception as e:
        print("%-24s FAILED: %s" % (name, str(e)[:200]), flush=True)


def dot_loop(dtype, acc):
    def f(a, b):
        def body(i, s):
            return s + jax.lax.dot(
                a + i.astype(a.dtype) * jnp.zeros((), a.dtype), b,
                preferred_element_type=acc)[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(0, 2, size=(M, K)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(0, 2, size=(K, N)).astype(np.int8))
    bench("int8 dot", dot_loop(jnp.int8, jnp.int32), a8, b8)
    try:
        a4 = a8.astype(jnp.int4)
        b4 = b8.astype(jnp.int4)
        bench("int4 dot", dot_loop(jnp.int4, jnp.int32), a4, b4)
    except Exception as e:
        print("int4 unsupported:", str(e)[:200])
    bench("bf16 dot", dot_loop(jnp.bfloat16, jnp.float32),
          a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16))


if __name__ == "__main__":
    main()
