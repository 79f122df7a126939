"""Microbenchmark the scan pipeline stages on the real TPU.

Isolates: stage-1 pallas kernel alone (amortized inside one dispatch — every
device->host fetch costs ~100 ms of tunnel latency, and block_until_ready is
a no-op on the axon platform), the compaction (_packed_nonzero), and the
fused whole-database loop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.ops import scan as S
from flashfry_tpu.ops.scan_kernel import stage1_pallas
from flashfry_tpu.standards import Cas9NGGParameterPack


def bench_loop(name, fn, first_arg, rest, work, K=16):
    """Time fn(first_arg ^ i, *rest) K times inside ONE dispatch (varying the
    input each iteration so XLA can't hoist the body out of the loop)."""
    @jax.jit
    def f(a0, *r):
        def body(i, acc):
            return acc + fn(a0 ^ i.astype(a0.dtype), *r).sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    t0 = time.time()
    np.asarray(f(first_arg, *rest))  # compile + first run
    tc = time.time() - t0
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        np.asarray(f(first_arg, *rest))
    dt = (time.time() - t0) / iters / K
    print("%-28s %.4fs/chunk  %.3g cmp/s  (compile+run %.1fs)"
          % (name, dt, work / dt, tc))


def main():
    pack = Cas9NGGParameterPack
    L = pack.total_scan_length
    n_act = len(pack.comparison_mask_positions())
    rng = np.random.default_rng(0)
    chunk = 1 << 23
    G = 1024
    codes_g = rng.integers(0, 4, size=(G, L))
    seqs = ["".join("ACGT"[c] for c in row) for row in codes_g]
    enc = BitEncoding(pack)
    longs = enc.encode_batch(seqs)
    guide_oh, n_active, _ = S.guide_onehot_matrix(longs, pack, pad_to=G)

    targets = rng.integers(0, 2 ** 46, size=chunk, dtype=np.uint64)
    codes = jnp.asarray(S.plane_codes(targets, L))
    from flashfry_tpu.ops.scan_kernel import guide_block_layout
    guide_i8 = guide_block_layout(jnp.asarray(guide_oh), L)

    inner = stage1_pallas(n_act, 4, chunk, G)
    bench_loop("stage1 pallas", inner, codes, (guide_i8,), chunk * G)

    @jax.jit
    def compact(m):
        idx, n = S._packed_nonzero(m.reshape(-1) > 0, 1 << 12)
        return idx[:1] + n
    mask = jnp.zeros((1, chunk), jnp.int8).at[0, ::1000].set(1)
    bench_loop("packed_nonzero(8M)", compact, mask, (), chunk)

    cap = S.DEFAULT_CAP
    goh = jnp.asarray(guide_oh)
    na = jnp.asarray(n_active)
    cols = jnp.asarray(
        np.sort(rng.choice(chunk, size=cap, replace=False)).astype(np.int32))

    @jax.jit
    def col_gather(c, cl):
        return c[:, cl].astype(jnp.int32).sum()
    bench_loop("stage2 column gather", lambda c, cl: col_gather(c, cl),
               codes, (cols,), cap * 32)

    @jax.jit
    def stage2(c, cl, g, n_a):
        t_oh = S.codes_onehot_jnp(c[:, cl], L)
        matches = jax.lax.dot(g.astype(jnp.bfloat16), t_oh,
                              preferred_element_type=jnp.float32)
        mm = jnp.minimum(n_a[:, None] - matches, 127)
        hits2d = (mm.T <= 4)
        flat, k = S._packed_nonzero(hits2d.reshape(-1), min(S.TRIPLET_CAP, cap * 4))
        return flat[:1] + k
    bench_loop("stage2 recount+compact", lambda c, cl, g, n_a: stage2(c, cl, g, n_a),
               codes, (cols, goh, na), cap * G)

    fused = S.make_fused_scan(L, n_act, 4, chunk, G, 2, cap,
                              S.TRIPLET_CAP, True)
    codes2 = jnp.concatenate([codes, codes], axis=1)

    @jax.jit
    def fused_once(c, g, n_a):
        return fused(c, g, n_a)[0, -2]
    bench_loop("fused 2-chunk", lambda c, g, n_a: fused_once(c, g, n_a),
               codes2, (goh, na), 2 * chunk * G, K=4)


if __name__ == "__main__":
    main()
