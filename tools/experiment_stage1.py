"""Stage-1/2 kernel variant experiments on the real TPU.

Times each candidate inside one dispatch (K iterations, input varied per
iteration so XLA cannot hoist the body). Run ad hoc while optimizing; the
winner gets folded back into ops/scan_kernel.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.ops import scan as S
from flashfry_tpu.ops.scan_kernel import stage1_pallas, OH_ROWS, CODE_ROWS
from flashfry_tpu.standards import Cas9NGGParameterPack


def bench_loop(name, fn, first_arg, rest, work, K=16):
    @jax.jit
    def f(a0, *r):
        def body(i, acc):
            return acc + fn(a0 ^ i.astype(a0.dtype), *r).sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))
    t0 = time.time()
    np.asarray(f(first_arg, *rest))
    tc = time.time() - t0
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        np.asarray(f(first_arg, *rest))
    dt = (time.time() - t0) / iters / K
    print("%-36s %.4fs/chunk  %.3g cmp/s  (compile %.1fs)"
          % (name, dt, work / dt, tc), flush=True)
    return dt


# ---- stage-1 variants -------------------------------------------------------

def make_v1_gloop(thr, chunk, g_rows, t_tile=4096, g_tile=128):
    """Loop over guide blocks inside the kernel; small (g_tile, T) int32
    intermediates instead of one (G, T)."""
    def kernel(code_ref, guide_ref, out_ref):
        codes = code_ref[:].astype(jnp.int32)
        rep = jnp.repeat(codes, 4, axis=0)
        b = jax.lax.broadcasted_iota(jnp.int32, (OH_ROWS, 1), 0) & 3
        t_oh = (rep == b).astype(jnp.int8)
        acc = jnp.full((1, t_tile), -1, jnp.int32)
        for gb in range(g_rows // g_tile):
            m = jnp.dot(guide_ref[gb * g_tile:(gb + 1) * g_tile, :], t_oh,
                        preferred_element_type=jnp.int32)
            acc = jnp.maximum(acc, jnp.max(m, axis=0, keepdims=True))
        out_ref[:] = (acc >= thr).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(chunk // t_tile,),
        in_specs=[
            pl.BlockSpec((CODE_ROWS, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, OH_ROWS), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, chunk), jnp.int8),
    )


def make_v3_int16(thr, chunk, g_rows, t_tile=4096):
    def kernel(code_ref, guide_ref, out_ref):
        codes = code_ref[:].astype(jnp.int32)
        rep = jnp.repeat(codes, 4, axis=0)
        b = jax.lax.broadcasted_iota(jnp.int32, (OH_ROWS, 1), 0) & 3
        t_oh = (rep == b).astype(jnp.int8)
        m = jnp.dot(guide_ref[:], t_oh, preferred_element_type=jnp.int16)
        hit = (m >= jnp.int16(thr)).astype(jnp.int32)
        out_ref[:] = (jnp.max(hit, axis=0, keepdims=True)).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(chunk // t_tile,),
        in_specs=[
            pl.BlockSpec((CODE_ROWS, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, OH_ROWS), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, chunk), jnp.int8),
    )


def make_v4_concat_onehot(thr, chunk, g_rows, t_tile=4096):
    """One-hot rows laid out b*32+i (4 plane compares, no repeat/iota).
    Guide matrix must be column-permuted to match (done by caller)."""
    def kernel(code_ref, guide_ref, out_ref):
        codes = code_ref[:].astype(jnp.int32)
        t_oh = jnp.concatenate(
            [(codes == b).astype(jnp.int8) for b in range(4)], axis=0)
        m = jnp.dot(guide_ref[:], t_oh, preferred_element_type=jnp.int32)
        out_ref[:] = (jnp.max(m, axis=0, keepdims=True) >= thr).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(chunk // t_tile,),
        in_specs=[
            pl.BlockSpec((CODE_ROWS, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, OH_ROWS), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, chunk), jnp.int8),
    )


def make_v6_bf16out(thr, chunk, g_rows, t_tile=4096):
    """Block one-hot + bf16 matmul OUTPUT: the (G, T) max-reduce epilogue
    runs at 2 bf16/lane/cycle instead of 1 int32 (matches <= 24 are exact
    in bf16). Combined with group2 row-halving this targets the epilogue,
    which costs as much as the K=128 matmul itself."""
    def kernel(code_ref, guide_ref, out_ref):
        codes = code_ref[:].astype(jnp.int32)
        t_oh = jnp.concatenate(
            [(codes == b).astype(jnp.int8) for b in range(4)], axis=0)
        m = jnp.dot(guide_ref[:], t_oh, preferred_element_type=jnp.bfloat16)
        out_ref[:] = (jnp.max(m, axis=0, keepdims=True) >=
                      jnp.bfloat16(thr)).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(chunk // t_tile,),
        in_specs=[
            pl.BlockSpec((CODE_ROWS, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, OH_ROWS), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, chunk), jnp.int8),
    )


def make_v5_tile(thr, chunk, g_rows, t_tile):
    def kernel(code_ref, guide_ref, out_ref):
        codes = code_ref[:].astype(jnp.int32)
        rep = jnp.repeat(codes, 4, axis=0)
        b = jax.lax.broadcasted_iota(jnp.int32, (OH_ROWS, 1), 0) & 3
        t_oh = (rep == b).astype(jnp.int8)
        m = jnp.dot(guide_ref[:], t_oh, preferred_element_type=jnp.int32)
        out_ref[:] = (jnp.max(m, axis=0, keepdims=True) >= thr).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(chunk // t_tile,),
        in_specs=[
            pl.BlockSpec((CODE_ROWS, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, OH_ROWS), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, chunk), jnp.int8),
    )


def make_expanded(thr, chunk, g_rows, t_tile, mode):
    """Decomposition kernels over a PRE-EXPANDED (128, chunk) one-hot input:
    mode 'full' = dot+max+thr, 'dot' = dot only (write one row),
    'copy' = no dot (DMA floor at 4x data)."""
    def kernel(oh_ref, guide_ref, out_ref):
        if mode == "copy":
            out_ref[:] = oh_ref[:1, :]
            return
        m = jnp.dot(guide_ref[:], oh_ref[:], preferred_element_type=jnp.int32)
        if mode == "dot":
            out_ref[:] = m[:1, :].astype(jnp.int8)
        else:
            out_ref[:] = (jnp.max(m, axis=0, keepdims=True) >= thr).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(chunk // t_tile,),
        in_specs=[
            pl.BlockSpec((OH_ROWS, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, OH_ROWS), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, chunk), jnp.int8),
    )


def main():
    pack = Cas9NGGParameterPack
    L = pack.total_scan_length
    n_act = len(pack.comparison_mask_positions())
    max_mm = 4
    thr = max(n_act - max_mm, 1)
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
    guide_i8 = jnp.zeros((G, 128), jnp.int8).at[:, :4 * L].set(
        jnp.asarray(guide_oh, jnp.int8))
    # permuted guide for v4: column 4i+b -> b*32+i
    perm = np.zeros((128, 128), dtype=np.int8)
    for i in range(32):
        for b in range(4):
            perm[4 * i + b, b * 32 + i] = 1
    guide_i8_blk = jnp.asarray(np.asarray(guide_i8) @ perm, jnp.int8)

    work = chunk * G

    def run(name, maker, cd, gd):
        try:
            f = maker()
            bench_loop(name, jax.jit(lambda c, g: f(c, g)), cd, (gd,), work)
        except Exception as e:
            print("%-36s FAILED: %s" % (name, str(e).split("\n")[0]), flush=True)

    which = os.environ.get(
        "VARIANTS", "0,3,4,5a,5b,e_full,e_dot,e_copy").split(",")
    if "0" in which:
        v0 = stage1_pallas(n_act, max_mm, chunk, G)
        bench_loop("v0 baseline (4096)", v0, codes, (guide_i8,), work)
    if "g2" in which:
        # paired guides: half the stage-1 rows, same logical work counted
        sup = jnp.maximum(guide_i8_blk[0::2], guide_i8_blk[1::2])
        vg = stage1_pallas(n_act, max_mm, chunk, G // 2)
        bench_loop("group2 (512 super rows)", vg, codes, (sup,), work)
    if "g2bf" in which:
        sup = jnp.maximum(guide_i8_blk[0::2], guide_i8_blk[1::2])
        run("group2 + bf16 epilogue",
            lambda: make_v6_bf16out(thr, chunk, G // 2), codes, sup)
    if "bf" in which:
        run("v6 bf16 epilogue", lambda: make_v6_bf16out(thr, chunk, G),
            codes, guide_i8_blk)
    if "1" in which:
        run("v1 g-loop 128", lambda: make_v1_gloop(thr, chunk, G), codes, guide_i8)
    if "3" in which:
        run("v3 int16 acc", lambda: make_v3_int16(thr, chunk, G), codes, guide_i8)
    if "4" in which:
        run("v4 concat one-hot", lambda: make_v4_concat_onehot(thr, chunk, G),
            codes, guide_i8_blk)
    if "5a" in which:
        run("v5a tile 2048", lambda: make_v5_tile(thr, chunk, G, 2048), codes, guide_i8)
    if "5b" in which:
        run("v5b tile 8192", lambda: make_v5_tile(thr, chunk, G, 8192), codes, guide_i8)

    if any(w.startswith("e_") for w in which):
        # pre-expanded one-hot input (4x the data of codes)
        oh_np = np.zeros((OH_ROWS, chunk), dtype=np.int8)
        cnp = np.asarray(S.plane_codes(targets, L))
        for i in range(L):
            for b in range(4):
                oh_np[4 * i + b] = cnp[i] == b
        oh_d = jnp.asarray(oh_np)
        del oh_np
        for mode in ("full", "dot", "copy"):
            if ("e_" + mode) in which:
                run("expanded " + mode,
                    lambda m=mode: make_expanded(thr, chunk, G, 4096, m),
                    oh_d, guide_i8)

    # ---- stage-2 gather alternatives ----------------------------------------
    cap = S.DEFAULT_CAP
    cols = jnp.asarray(
        np.sort(rng.choice(chunk, size=cap, replace=False)).astype(np.int32))

    @jax.jit
    def g32(c, cl):
        return c[:, cl].astype(jnp.int32).sum()
    bench_loop("gather (32,N)[:,cols]", g32, codes, (cols,), cap * 32)

    lo, hi = S.split_words(targets)
    words = jnp.asarray(np.stack([lo, hi]))  # (2, N) int32

    @jax.jit
    def g2(w, cl):
        return w[:, cl].sum()
    bench_loop("gather (2,N)[:,cols]", g2, words, (cols,), cap * 2)

    @jax.jit
    def g2_unpack(w, cl):
        sel = w[:, cl]                                   # (2, cap)
        lo32, hi32 = sel[0], sel[1]
        rows = []
        for i in range(L):
            s = 2 * (L - 1 - i)
            if s < 32:
                rows.append((jax.lax.shift_right_logical(lo32, s) & 3))
            else:
                rows.append((jax.lax.shift_right_logical(hi32, s - 32) & 3))
        c = jnp.stack(rows)                              # (L, cap) int32
        oh = (c[:, None, :] == jnp.arange(4, dtype=jnp.int32)[None, :, None])
        return oh.astype(jnp.int32).sum()
    bench_loop("gather+unpack (2,N)", g2_unpack, words, (cols,), cap * 32)


if __name__ == "__main__":
    main()
