"""Fused Pallas TPU kernel for the off-target scan (stage 1).

For each tile of packed targets this kernel unpacks the 2-bit bases, builds
the one-hot expansion in VMEM, multiplies against the guide one-hot matrix on
the MXU, thresholds mismatch counts and reduces to a per-target "any guide
hits" byte. Only 1 byte/target leaves the kernel — the (G, N) mismatch matrix
never touches HBM.

This replaces the reference's scalar inner loop
(reference/binary/blocks/BlockManager.scala:225-253) and realizes the
data-parallel formulation its commented-out GPU kernel sketched
(java/bitcoding/GPUBitBlockCompare.java).

Layouts (per tile, TPU-friendly: lane dim = 128):
  lo, hi        (T_TILE, 1)   int32   packed sequence bits (low 32 / high 16)
  guide_oh_t    (128, G)      bf16    transposed guide one-hot, 4L<=96 rows used
  n_active      (1, G)        f32     |active positions| per guide (127 = pad)
  out           (T_TILE, 1)   int8    1 if any guide has mm <= k
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 1024
OH_ROWS = 128  # padded one-hot width (4*L <= 96 for all enzymes)


def _stage1_kernel(L: int, max_mm: int, lo_ref, hi_ref, guide_ref, nact_ref, out_ref):
    # column metadata: j = 4*i + b  ->  base index i, base value b
    j = jax.lax.broadcasted_iota(jnp.int32, (1, OH_ROWS), dimension=1)
    i = j >> 2
    b = j & 3
    s = 2 * (L - 1 - i)
    s_clamped = jnp.clip(s, 0, 62)
    col_valid = (j < 4 * L) & (s >= 0)

    lo = lo_ref[:]  # (T, 1) int32
    hi = hi_ref[:]

    code = jnp.where(s_clamped < 32,
                     (lo >> s_clamped) & 3,
                     (hi >> jnp.maximum(s_clamped - 32, 0)) & 3)  # (T, 128)
    t_oh = jnp.where(col_valid & (code == b), 1, 0).astype(jnp.bfloat16)

    matches = jnp.dot(t_oh, guide_ref[:], preferred_element_type=jnp.float32)  # (T, G)
    mm = nact_ref[:] - matches
    hit = (mm <= float(max_mm)).astype(jnp.int32)
    out_ref[:] = jnp.max(hit, axis=1, keepdims=True).astype(jnp.int8)


@functools.lru_cache(maxsize=8)
def stage1_pallas(L: int, max_mm: int, chunk: int, g_rows: int):
    """Returns jitted (lo, hi, guide_oh, n_active) -> (chunk,) bool,
    signature-compatible with the jnp stage 1 in ops.scan."""
    assert chunk % T_TILE == 0
    grid = (chunk // T_TILE,)

    kernel = functools.partial(_stage1_kernel, L, max_mm)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T_TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((OH_ROWS, g_rows), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_rows), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunk, 1), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * chunk * OH_ROWS * g_rows,
            bytes_accessed=chunk * 9 + OH_ROWS * g_rows * 2,
            transcendentals=0,
        ),
    )

    @jax.jit
    def f(lo, hi, guide_oh, n_active):
        # adapt engine-facing layouts to kernel layouts
        guide_oh_t = jnp.zeros((OH_ROWS, g_rows), jnp.bfloat16)
        guide_oh_t = guide_oh_t.at[: guide_oh.shape[1], :].set(
            guide_oh.astype(jnp.bfloat16).T)
        out = call(lo.reshape(chunk, 1), hi.reshape(chunk, 1),
                   guide_oh_t, n_active.reshape(1, g_rows).astype(jnp.float32))
        return out.reshape(chunk) > 0

    return f
