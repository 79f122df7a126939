"""Drill into the triplet-compaction cost inside the fused loop: ablate
_packed_nonzero's internals (tile counts, searchsorted, row gather, lane
ranking) over the (col_cap x G) hits2d domain at library caps."""
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
chunk = 1 << 23
G = 1024
col_cap = 8192
block_cap = 65536
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

    def make(stop, tile=512):
        def f(codes_full, guide_oh, n_active):
            guide_i8 = guide_block_layout(guide_oh, L)

            def body(c, acc):
                start = c * chunk
                codes_chunk = jax.lax.dynamic_slice_in_dim(
                    codes_full, start, chunk, axis=1)
                hit = inner(codes_chunk, guide_i8)
                cols, n_cols = S._packed_nonzero(hit, col_cap)
                selT = codes_chunk[:, cols].T
                sel32 = selT.astype(jnp.int32)
                t_ohT = jnp.concatenate(
                    [(sel32 == b).astype(jnp.int8) for b in range(4)], axis=1)
                matches = jax.lax.dot(t_ohT, guide_i8.T,
                                      preferred_element_type=jnp.int32)
                mmT = jnp.minimum(
                    n_active[None, :].astype(jnp.int32) - matches, 127)
                col_ok = jnp.arange(col_cap) < n_cols
                hits2d = (mmT <= max_mm) & col_ok[:, None]
                mask = hits2d.reshape(-1)
                # ---- _packed_nonzero internals, cut at `stop` ----
                n_el = mask.shape[0]
                nt = n_el // tile
                m2 = mask.reshape(nt, tile)
                tcnt = m2.sum(axis=1, dtype=jnp.int32)
                tile_cum = jnp.cumsum(tcnt)
                n = tile_cum[-1]
                if stop == "tilecnt":
                    return acc + n
                q = jnp.arange(1, block_cap + 1, dtype=jnp.int32)
                qt = jnp.searchsorted(tile_cum, q, side="left")
                qt = jnp.minimum(qt, nt - 1)
                if stop == "searchsorted":
                    return acc + n + qt.sum()
                r = q - (tile_cum[qt] - tcnt[qt])
                rows = m2[qt].astype(jnp.int32)
                if stop == "rowgather":
                    return acc + n + rows.sum()
                lc = jnp.cumsum(rows, axis=1)
                pos = jnp.sum(lc < r[:, None], axis=1)
                idx = qt * tile + pos
                flat = jnp.minimum(idx, n_el - 1).astype(jnp.int32)
                return acc + n + flat.sum()

            return jax.lax.fori_loop(0, N_CHUNKS, body, jnp.int32(0))

        return jax.jit(f)

    args = (codes, guide_oh, n_active)
    for tile in (512, 128):
        for stop in ("tilecnt", "searchsorted", "rowgather", "rank"):
            bench("%s tile=%d" % (stop, tile), make(stop, tile), args)


if __name__ == "__main__":
    main()
