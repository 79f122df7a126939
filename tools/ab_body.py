"""Ablate the fused-scan chunk body: time fori_loop variants that cut the
body off after each stage, at library-settled caps. The deltas locate the
cost INSIDE the real loop (isolated-stage microbenchmarks miss loop-carried
effects like the triplet-buffer DUS)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.ops import scan as S
from flashfry_tpu.ops.scan_kernel import stage1_pallas, guide_block_layout
from flashfry_tpu.standards import Cas9NGGParameterPack

pack = Cas9NGGParameterPack
L = pack.total_scan_length
n_act = len(pack.comparison_mask_positions())
max_mm = 4
thr = n_act - max_mm
chunk = 1 << 23
G = 1024
col_cap = 8192
trip_cap = 524288
block_cap = min(trip_cap, col_cap * 8)
width = trip_cap + block_cap + 2
N_CHUNKS = 4


def bench(name, f, args, K=3):
    t0 = time.time()
    np.asarray(f(*args))
    tc = time.time() - t0
    ts = []
    for _ in range(K):
        t0 = time.time()
        np.asarray(f(*args))
        ts.append(time.time() - t0)
    dt = min(ts) / N_CHUNKS
    print("%-32s %7.4fs/chunk (compile %.1fs)" % (name, dt, tc), flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 4, size=(32, chunk * N_CHUNKS)).astype(np.int8)
    codes_np[L:] = 0
    codes = jnp.asarray(codes_np)
    seqs = ["".join("ACGT"[c] for c in row)
            for row in rng.integers(0, 4, size=(G, L))]
    enc = BitEncoding(pack)
    longs = enc.encode_batch(seqs)
    guide_oh_np, n_active_np, _ = S.guide_onehot_matrix(longs, pack, pad_to=G)
    guide_oh = jnp.asarray(guide_oh_np)
    n_active = jnp.asarray(n_active_np)

    inner = stage1_pallas(n_act, max_mm, chunk, G)

    def make(stop, trip_tile=128, int8=True):
        def f(codes_full, guide_oh, n_active):
            guide_bf = guide_oh.astype(jnp.bfloat16)
            guide_bf_T = guide_bf.T
            guide_i8 = guide_block_layout(guide_oh, L)

            def body(c, carry):
                count, col_of, trip_of, buf = carry
                start = c * chunk
                codes_chunk = jax.lax.dynamic_slice_in_dim(
                    codes_full, start, chunk, axis=1)
                hit = inner(codes_chunk, guide_i8)
                if stop == "stage1":
                    return (count + hit.sum().astype(jnp.int32),
                            col_of, trip_of, buf)
                cols, n_cols = S._packed_nonzero(hit, col_cap)
                if stop == "cols":
                    return (count + n_cols + cols[0], col_of, trip_of, buf)
                selT = codes_chunk[:, cols].T
                if stop == "gather":
                    return (count + selT.astype(jnp.int32).sum(),
                            col_of, trip_of, buf)
                if int8:
                    sel32 = selT.astype(jnp.int32)
                    t_ohT = jnp.concatenate(
                        [(sel32 == b).astype(jnp.int8) for b in range(4)],
                        axis=1)
                    matches = jax.lax.dot(t_ohT, guide_i8.T,
                                          preferred_element_type=jnp.int32)
                    mmT = jnp.minimum(
                        n_active[None, :].astype(jnp.int32) - matches, 127)
                else:
                    t_ohT = (selT[:, :L, None] ==
                             jnp.arange(4, dtype=selT.dtype)
                             ).reshape(col_cap, 4 * L)
                    matches = jax.lax.dot(t_ohT.astype(jnp.bfloat16),
                                          guide_bf_T,
                                          preferred_element_type=jnp.float32)
                    mmT = jnp.minimum(n_active[None, :] - matches, 127)
                col_ok = jnp.arange(col_cap) < n_cols
                hits2d = (mmT <= max_mm) & col_ok[:, None]
                if stop == "recount":
                    return (count + hits2d.sum().astype(jnp.int32),
                            col_of, trip_of, buf)
                flat, k = S._packed_nonzero(hits2d.reshape(-1), block_cap,
                                            tile=trip_tile)
                if stop == "flat":
                    return count + k + flat[0], col_of, trip_of, buf
                g_idx = (flat % G).astype(jnp.int32)
                t_idx = (start + cols[flat // G]).astype(jnp.int32)
                mm_v = mmT.reshape(-1)[flat].astype(jnp.int32)
                block = jnp.stack([t_idx, (g_idx << 8) | mm_v])
                if stop == "triplets":
                    return (count + block.sum().astype(jnp.int32),
                            col_of, trip_of, buf)
                safe = jnp.minimum(count, trip_cap)
                buf = jax.lax.dynamic_update_slice(buf, block, (0, safe))
                count = count + k
                col_of = col_of | (n_cols > col_cap) | (k > block_cap)
                trip_of = trip_of | (k > block_cap) | (count > trip_cap)
                return count, col_of, trip_of, buf

            carry = (jnp.int32(0), jnp.bool_(False), jnp.bool_(False),
                     jnp.zeros((2, width), jnp.int32))
            count, col_of, trip_of, buf = jax.lax.fori_loop(
                0, N_CHUNKS, body, carry)
            return count + buf[0, :8].sum()

        return jax.jit(f)

    args = (codes, guide_oh, n_active)
    for stop in ("stage1", "cols", "gather", "recount", "flat",
                 "triplets", "full"):
        bench(stop, make(stop), args)
    bench("full tile=512", make("full", trip_tile=512), args)
    bench("full bf16", make("full", int8=False), args)


if __name__ == "__main__":
    main()
