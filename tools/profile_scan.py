"""Microbenchmark the scan pipeline stages on the real TPU.

Isolates: stage-1 pallas kernel alone, the jnp unpack+matmul alternative,
the compaction (_packed_nonzero) cost, and the full fused loop — so we know
where the 0.63 s/scan goes and what to optimize.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flashfry_tpu.ops import scan as S
from flashfry_tpu.ops.scan_kernel import stage1_pallas
from flashfry_tpu.standards import Cas9NGGParameterPack


def _force(r):
    # block_until_ready is a no-op on the remote axon platform; force a
    # real device->host fetch of one element of every output
    leaves = jax.tree_util.tree_leaves(r)
    return [np.asarray(x.ravel()[0]) if hasattr(x, "ravel") else x for x in leaves]


def timeit(f, *args, iters=5, warmup=1):
    for _ in range(warmup):
        _force(f(*args))
    t0 = time.time()
    for _ in range(iters):
        _force(f(*args))
    return (time.time() - t0) / iters


def main():
    pack = Cas9NGGParameterPack
    L = pack.total_scan_length
    rng = np.random.default_rng(0)
    chunk = 1 << 23
    G = 1024
    lo = jnp.asarray(rng.integers(0, 2**31, size=chunk, dtype=np.int64).astype(np.int32))
    hi = jnp.asarray(rng.integers(0, 2**14, size=chunk, dtype=np.int64).astype(np.int32))
    codes = rng.integers(0, 4, size=(G, L))
    seqs = ["".join("ACGT"[c] for c in row) for row in codes]
    from flashfry_tpu.bitcoding import BitEncoding
    enc = BitEncoding(pack)
    longs = enc.encode_batch(seqs)
    guide_oh, n_active, _ = guide_stuff = S.guide_onehot_matrix(longs, pack, pad_to=G)
    guide_oh_d = jax.device_put(guide_oh)
    n_active_d = jax.device_put(n_active)

    cmp_per_call = chunk * G

    # 1. stage1 pallas alone
    k = stage1_pallas(L, 4, chunk, G)
    t0 = time.time()
    dt = timeit(k, lo, hi, guide_oh_d, n_active_d)
    print("stage1 pallas:  %.4fs  -> %.3g cmp/s  (compile+5 iters total %.1fs)"
          % (dt, cmp_per_call / dt, time.time() - t0))

    # 2. compaction alone: cumsum+searchsorted over chunk
    @jax.jit
    def compact(mask):
        return S._packed_nonzero(mask, 1 << 14)
    mask = jnp.zeros(chunk, bool).at[::1000].set(True)
    dt = timeit(compact, mask)
    print("packed_nonzero: %.4fs over %d elems" % (dt, chunk))

    # 3. fused loop (2 chunks = 16M targets)
    n_chunks = 2
    n_total = n_chunks * chunk
    lo_full = jnp.concatenate([lo, lo])
    hi_full = jnp.concatenate([hi, hi])
    fused = S._fused_scan_jit(L, 4, chunk, G, n_chunks, S.DEFAULT_CAP,
                              S.TRIPLET_CAP, True)
    t0 = time.time()
    dt = timeit(fused, lo_full, hi_full, guide_oh_d, n_active_d,
                np.int32(n_total), iters=3)
    print("fused 2-chunk:  %.4fs  -> %.3g cmp/s  (compile+3 iters total %.1fs)"
        % (dt, n_total * G / dt, time.time() - t0))


if __name__ == "__main__":
    main()
