"""TPU mismatch scan: one-hot matmuls on the MXU.

This is the TPU-native re-formulation of the reference's hot loop
(reference: reference/binary/blocks/BlockManager.scala:212-254 — per-target,
per-guide XOR + masked popcount; and the abandoned GPU formulation at
java/bitcoding/GPUBitBlockCompare.java). Instead of translating the scalar
popcount loop, we observe that for 2-bit base codes

    mismatches(g, t) = |active(g)| - <onehot(g), onehot(t)>

where onehot(x) is the 4L-wide one-hot expansion of the L bases and the guide
side is zeroed at PAM/masked positions. The inner product over a batch of
guides and a block of targets is a (G, 4L) x (4L, T) matmul — exactly what
the MXU does at speed-of-light. At bf16 the products are exact (0/1 values,
sums <= 24 << 256).

Two-stage pipeline to avoid materializing the (G, N) matrix in HBM:

  stage 1 (per chunk): hit_any[t] = any_g(mismatches(g,t) <= k)   [MXU + VPU]
  stage 2 (per chunk): gather the few hit columns, recompute the exact
           (G, CAP) mismatch counts, ship that small block to host.

Stage 1 runs either as a fused Pallas kernel (unpack + one-hot + matmul in
VMEM, only 1 byte/target written back) or as plain jnp for interpret/CPU.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import numpy as np

from ..bitcoding import STRING_MASK
from ..database import Database
from ..standards import ParameterPack

_PAD_MM = 127  # mismatch count assigned to guide padding rows


_cache_enabled = False


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the scan kernels compile once per
    (shape, enzyme) and are reused across CLI invocations. First TPU compile
    is tens of seconds; with the cache, repeat discover runs start scanning
    immediately. Opt out with FLASHFRY_TPU_NO_COMPILE_CACHE=1."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    import os
    if os.environ.get("FLASHFRY_TPU_NO_COMPILE_CACHE"):
        return
    import tempfile
    import jax
    cache_dir = os.environ.get(
        "FLASHFRY_TPU_COMPILE_CACHE",
        os.path.join(tempfile.gettempdir(), "flashfry_tpu_xla_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def default_platform() -> str:
    """The platform jax will actually place arrays on, honoring
    jax.config.jax_default_device (used by tests to pin CPU even though the
    axon TPU plugin pre-registers the real chip)."""
    import jax
    d = jax.config.jax_default_device
    if d is not None:
        return d.platform
    return jax.devices()[0].platform


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def split_words(longs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """uint64 -> (lo32, hi16) as int32 arrays (sequence bits only)."""
    seq = np.asarray(longs, dtype=np.uint64) & STRING_MASK
    lo = (seq & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    hi = (seq >> np.uint64(32)).astype(np.uint32).view(np.int32)
    return lo, hi


def guide_onehot_matrix(guide_longs: np.ndarray, pack: ParameterPack,
                        pad_to: int = 128) -> Tuple[np.ndarray, np.ndarray, int]:
    """(G_pad, 4L) float32 one-hot guide matrix, masked positions zeroed.

    Returns (onehot, n_active_adj, G) where n_active_adj[g] is |active|
    for real guides and _PAD_MM for padding rows (so padding never 'hits').
    """
    L = pack.total_scan_length
    active = pack.comparison_mask_positions()
    g = np.asarray(guide_longs, dtype=np.uint64) & STRING_MASK
    G = g.shape[0]
    Gp = max(pad_to, int(np.ceil(G / pad_to)) * pad_to)
    onehot = np.zeros((Gp, 4 * L), dtype=np.float32)
    for i in active:
        shift = np.uint64(2 * (L - 1 - i))
        codes = ((g >> shift) & np.uint64(3)).astype(np.int64)
        onehot[np.arange(G), 4 * i + codes] = 1.0
    n_active = np.full(Gp, _PAD_MM, dtype=np.float32)
    n_active[:G] = len(active)
    return onehot, n_active, G


# ---------------------------------------------------------------------------
# device: unpack + one-hot
# ---------------------------------------------------------------------------

def _packed_nonzero(mask, size: int):
    """Indices of the first `size` set bits of a 1-D bool array, packed.

    Equivalent to jnp.nonzero(mask, size=size) but lowered as cumsum +
    binary search (searchsorted) instead of an n-element scatter — scatters
    serialize badly on TPU, turning compaction into the scan bottleneck.
    Returns (idx int32[size] — entries beyond the true count clamp to n-1,
    count int32)."""
    import jax.numpy as jnp
    cnt = jnp.cumsum(mask.astype(jnp.int32))
    n = cnt[-1]
    idx = jnp.searchsorted(cnt, jnp.arange(1, size + 1, dtype=jnp.int32),
                           side="left")
    return jnp.minimum(idx, mask.shape[0] - 1).astype(jnp.int32), n


def _unpack_onehot_jnp(lo, hi, L):
    """(T,) int32 pair -> (4L, T) bf16 one-hot (column-major targets)."""
    import jax.numpy as jnp
    cols = []
    for i in range(L):
        s = 2 * (L - 1 - i)
        if s < 32:
            c = (lo >> s) & 3
        else:
            c = (hi >> (s - 32)) & 3
        cols.append(c)
    codes = jnp.stack(cols)  # (L, T) int32
    onehot = (codes[:, None, :] == jnp.arange(4, dtype=jnp.int32)[None, :, None])
    return onehot.reshape(4 * L, -1).astype(jnp.bfloat16)


@functools.lru_cache(maxsize=8)
def _stage1_jit(L: int, max_mm: int, chunk: int, g_rows: int, use_pallas: bool):
    """hit_any over chunk [start, start+chunk) of the full packed arrays:
    (lo_full, hi_full, start, guide_oh, n_active) -> (chunk,) bool.

    Slicing happens inside jit so each chunk costs a single dispatch
    (important over the remote-TPU tunnel, where per-call latency is high).
    """
    import jax
    import jax.numpy as jnp

    if use_pallas:
        from .scan_kernel import stage1_pallas
        inner = stage1_pallas(L, max_mm, chunk, g_rows)

        @jax.jit
        def f(lo_full, hi_full, start, guide_oh, n_active):
            lo = jax.lax.dynamic_slice_in_dim(lo_full, start, chunk)
            hi = jax.lax.dynamic_slice_in_dim(hi_full, start, chunk)
            return inner(lo, hi, guide_oh, n_active)

        return f

    def f(lo_full, hi_full, start, guide_oh, n_active):
        lo = jax.lax.dynamic_slice_in_dim(lo_full, start, chunk)
        hi = jax.lax.dynamic_slice_in_dim(hi_full, start, chunk)
        t_oh = _unpack_onehot_jnp(lo, hi, L)                       # (4L, T)
        matches = jax.lax.dot(guide_oh.astype(jnp.bfloat16), t_oh,
                              preferred_element_type=jnp.float32)  # (G, T)
        mm = n_active[:, None] - matches
        return (mm <= max_mm).any(axis=0)

    return jax.jit(f)


@functools.lru_cache(maxsize=8)
def _fused_scan_jit(L: int, max_mm: int, chunk: int, g_rows: int,
                    n_chunks: int, col_cap: int, trip_cap: int,
                    use_pallas: bool):
    """Whole-database scan in ONE device dispatch.

    A lax.fori_loop walks every chunk: stage-1 hit detection (Pallas kernel /
    jnp), on-device column compaction, exact mismatch recount for the hit
    columns, then flat compaction of (target, guide, mm) triplets appended to
    global buffers. Only the compact triplet buffers ever cross the
    host<->device link — essential over a high-latency remote-TPU tunnel
    where per-dispatch round trips would otherwise dominate the scan.

    Returns (count, overflow, t_buf, g_buf, mm_buf); triplets are ordered
    (chunk, target, guide) = global target-major, the order FlashFry applies
    hits in (reference/traverser/SeekTraverser.scala:58-104).

    col_cap: max stage-1 hit targets per chunk; trip_cap: max total triplets.
    If either overflows, the overflow flag is set and the caller falls back.
    """
    import jax
    import jax.numpy as jnp

    if use_pallas:
        from .scan_kernel import stage1_pallas
        inner = stage1_pallas(L, max_mm, chunk, g_rows)
    else:
        def inner(lo, hi, guide_oh, n_active):
            t_oh = _unpack_onehot_jnp(lo, hi, L)
            matches = jax.lax.dot(guide_oh.astype(jnp.bfloat16), t_oh,
                                  preferred_element_type=jnp.float32)
            mm = n_active[:, None] - matches
            return (mm <= max_mm).any(axis=0)

    # per-chunk triplet block size: nonzero packs real hits first, so the
    # block is appended with one contiguous dynamic_update_slice (TPU scatter
    # lowering is slow; DUS is a plain copy). Buffers are over-allocated by a
    # block so the append window never clamps.
    block_cap = min(trip_cap, col_cap * 4)

    def f(lo_full, hi_full, guide_oh, n_active, n_targets):
        guide_bf = guide_oh.astype(jnp.bfloat16)

        def body(c, carry):
            count, overflow, t_buf, g_buf, mm_buf = carry
            start = c * chunk
            lo = jax.lax.dynamic_slice_in_dim(lo_full, start, chunk)
            hi = jax.lax.dynamic_slice_in_dim(hi_full, start, chunk)
            hit = inner(lo, hi, guide_oh, n_active)                # (chunk,)
            hit = hit & ((start + jnp.arange(chunk)) < n_targets)
            cols, n_cols = _packed_nonzero(hit, col_cap)
            # exact mismatch counts for the hit columns
            t_oh = _unpack_onehot_jnp(lo[cols], hi[cols], L)       # (4L, cap)
            matches = jax.lax.dot(guide_bf, t_oh,
                                  preferred_element_type=jnp.float32)
            mm = jnp.minimum(n_active[:, None] - matches, _PAD_MM)  # (G, cap)
            col_ok = jnp.arange(col_cap) < n_cols
            mmT = mm.T                                             # (cap, G)
            hits2d = (mmT <= max_mm) & col_ok[:, None]
            flat, k = _packed_nonzero(hits2d.reshape(-1), block_cap)
            g_idx = (flat % g_rows).astype(jnp.int32)
            t_idx = (start + cols[flat // g_rows]).astype(jnp.int32)
            mm_v = mmT.reshape(-1)[flat].astype(jnp.int8)
            safe = jnp.minimum(count, trip_cap)
            t_buf = jax.lax.dynamic_update_slice_in_dim(t_buf, t_idx, safe, 0)
            g_buf = jax.lax.dynamic_update_slice_in_dim(g_buf, g_idx, safe, 0)
            mm_buf = jax.lax.dynamic_update_slice_in_dim(mm_buf, mm_v, safe, 0)
            count = count + k
            overflow = overflow | (n_cols > col_cap) | (k > block_cap) | (count > trip_cap)
            return count, overflow, t_buf, g_buf, mm_buf

        carry = (jnp.int32(0), jnp.bool_(False),
                 jnp.zeros(trip_cap + block_cap, jnp.int32),
                 jnp.zeros(trip_cap + block_cap, jnp.int32),
                 jnp.zeros(trip_cap + block_cap, jnp.int8))
        return jax.lax.fori_loop(0, n_chunks, body, carry)

    return jax.jit(f)


@functools.lru_cache(maxsize=8)
def _stage2_jit(L: int, cap: int, g_rows: int):
    """Gather hit columns + exact mismatch counts for them.

    (hit_any, lo_full, hi_full, start, guide_oh, n_active, valid_len) ->
      (n_hits, col_idx (cap,), mm (G, cap) int8)  — col_idx chunk-relative
    """
    import jax
    import jax.numpy as jnp

    def f(hit_any, lo_full, hi_full, start, guide_oh, n_active, valid_len):
        in_range = jnp.arange(hit_any.shape[0]) < valid_len
        hit_any = hit_any & in_range
        n = hit_any.sum()
        (col_idx,) = jnp.nonzero(hit_any, size=cap, fill_value=-1)
        safe = start + jnp.maximum(col_idx, 0)
        t_oh = _unpack_onehot_jnp(lo_full[safe], hi_full[safe], L)  # (4L, cap)
        matches = jax.lax.dot(guide_oh.astype(jnp.bfloat16), t_oh,
                              preferred_element_type=jnp.float32)
        mm = jnp.minimum(n_active[:, None] - matches, _PAD_MM).astype(jnp.int8)
        return n, col_idx, mm

    return jax.jit(f)


DEFAULT_CHUNK = 1 << 23
DEFAULT_CAP = 1 << 14
TRIPLET_CAP = 1 << 17   # max (guide, target) hit pairs per fused block scan
PIPELINE_DEPTH = 4  # chunks in flight before forcing results to host


class DeviceScanner:
    """Holds the database on device and scans guide batches against it."""

    def __init__(self, db: Database, use_pallas: Optional[bool] = None,
                 chunk: Optional[int] = None, cap: int = DEFAULT_CAP,
                 trip_cap: int = TRIPLET_CAP):
        import jax
        import jax.numpy as jnp
        enable_compilation_cache()
        self.trip_cap = trip_cap
        self.db = db
        self.L = db.pack.total_scan_length
        if use_pallas is None:
            use_pallas = default_platform() == "tpu"
        if chunk is None:
            # the pallas kernel never materializes the (G, chunk) matrix, so
            # big chunks amortize dispatch latency; the jnp fallback does
            # materialize intermediates, so keep its chunks moderate
            chunk = DEFAULT_CHUNK if use_pallas else (1 << 20)
        self.chunk = chunk
        self.cap = cap
        n = db.num_targets
        self.n = n
        n_pad = max(chunk, int(np.ceil(max(n, 1) / chunk)) * chunk)
        lo, hi = split_words(db.targets)
        lo_pad = np.zeros(n_pad, dtype=np.int32)
        hi_pad = np.zeros(n_pad, dtype=np.int32)
        lo_pad[:n] = lo
        hi_pad[:n] = hi
        self.lo = jax.device_put(lo_pad)
        self.hi = jax.device_put(hi_pad)
        self.use_pallas = use_pallas
        # per-target bin ids for chunk-level pruning
        self._tgt_bin_bounds = db.bin_start

    def _chunk_has_work(self, lo_t: int, hi_t: int, active_bins: Optional[np.ndarray]) -> bool:
        if active_bins is None:
            return True
        b0 = int(np.searchsorted(self._tgt_bin_bounds, lo_t, side="right")) - 1
        b1 = int(np.searchsorted(self._tgt_bin_bounds, hi_t - 1, side="right")) - 1
        return bool(active_bins[b0:b1 + 1].any())

    def scan(self, guide_longs: np.ndarray, max_mismatch: int,
             bin_mask: Optional[np.ndarray] = None,
             stats=None) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Yield (target_idx, guide_idx, mm) batches; within each guide, hits
        arrive in global target order (the ordering the overflow cap needs).

        Guides run in fixed-size blocks (128..1024 rows) so every device
        executable has one of a handful of static shapes — compiled once,
        persistently cached, reused for any guide count.
        """
        g_all = np.asarray(guide_longs, dtype=np.uint64)
        n_guides = g_all.shape[0]
        block = 128
        while block < n_guides and block < 1024:
            block *= 2
        for g_lo in range(0, max(n_guides, 1), block):
            g_hi = min(n_guides, g_lo + block)
            sub_mask = bin_mask[:, g_lo:g_hi] if bin_mask is not None else None
            for t_idx, g_idx, mm in self._scan_guide_block(
                    g_all[g_lo:g_hi], max_mismatch, sub_mask, stats, block):
                yield t_idx, g_idx + g_lo, mm

    def _scan_guide_block(self, guide_longs: np.ndarray, max_mismatch: int,
                          bin_mask: Optional[np.ndarray], stats,
                          pad_to: int) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """One fixed-shape guide block against the whole database, in a
        single fused device dispatch (per-chunk pipeline as fallback)."""
        import jax
        guide_oh, n_active, G = guide_onehot_matrix(guide_longs, self.db.pack,
                                                    pad_to=pad_to)
        n_chunks = self.lo.shape[0] // self.chunk
        fused = _fused_scan_jit(self.L, max_mismatch, self.chunk,
                                guide_oh.shape[0], n_chunks, self.cap,
                                self.trip_cap, self.use_pallas)
        count_d, overflow_d, t_d, g_d, mm_d = fused(
            self.lo, self.hi, jax.device_put(guide_oh),
            jax.device_put(n_active), np.int32(self.n))
        count = int(count_d)
        if stats is not None:
            stats.all_targets += self.n * (1 if G else 0)
            stats.dense_comparisons += self.n * G
            stats.all_comparisons += self.n * G
        if not bool(overflow_d) and count <= self.trip_cap:
            if count == 0:
                return
            k = min(self.trip_cap, ((count + 1023) // 1024) * 1024)
            t_idx = np.asarray(t_d[:k])[:count].astype(np.int64)
            g_idx = np.asarray(g_d[:k])[:count].astype(np.int64)
            mm = np.asarray(mm_d[:k])[:count]
            yield t_idx, g_idx, mm
            return
        yield from self._scan_guide_block_chunked(guide_longs, max_mismatch,
                                                  bin_mask, None, pad_to)

    def _scan_guide_block_chunked(self, guide_longs: np.ndarray, max_mismatch: int,
                                  bin_mask: Optional[np.ndarray], stats,
                                  pad_to: int) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-chunk two-stage pipeline (fallback for triplet-cap overflow)."""
        import jax
        guide_oh, n_active, G = guide_onehot_matrix(guide_longs, self.db.pack,
                                                    pad_to=pad_to)
        guide_oh_d = jax.device_put(guide_oh)
        n_active_d = jax.device_put(n_active)
        stage1 = _stage1_jit(self.L, max_mismatch, self.chunk, guide_oh.shape[0], self.use_pallas)
        stage2 = _stage2_jit(self.L, self.cap, guide_oh.shape[0])

        active_bins = bin_mask.any(axis=1) if bin_mask is not None else None

        # pipelined dispatch: enqueue several chunks of device work before
        # blocking on the first result, so device compute, the host loop and
        # device->host transfers overlap (jax dispatch is async)
        from collections import deque
        in_flight = deque()

        def drain_one():
            lo_t, hi_t, n_dev, col_idx_dev, mm_dev = in_flight.popleft()
            n = int(n_dev)
            if n == 0:
                return None
            if n > self.cap:
                # overflow: fall back to exact host scan for this chunk
                return list(self._host_chunk(lo_t, hi_t, guide_longs, max_mismatch))
            # transfer only the used prefix (rounded for shape stability) —
            # matters over the remote-TPU tunnel
            k = min(self.cap, ((n + 255) // 256) * 256)
            col_idx = np.asarray(col_idx_dev[:k])[:n]
            mm_np = np.asarray(mm_dev[:, :k])[:G, :n]  # (G, n)
            hits = mm_np <= max_mismatch
            t_loc, g_idx = np.nonzero(hits.T)          # target-major order
            return [(col_idx[t_loc] + lo_t, g_idx, mm_np[g_idx, t_loc])]

        for lo_t in range(0, self.n, self.chunk):
            hi_t = min(self.n, lo_t + self.chunk)
            if not self._chunk_has_work(lo_t, hi_t, active_bins):
                continue
            start = np.int32(lo_t)
            hit_any = stage1(self.lo, self.hi, start, guide_oh_d, n_active_d)
            n, col_idx, mm = stage2(hit_any, self.lo, self.hi, start,
                                    guide_oh_d, n_active_d, np.int32(hi_t - lo_t))
            if stats is not None:
                stats.all_targets += hi_t - lo_t
                stats.dense_comparisons += (hi_t - lo_t) * G
                stats.all_comparisons += (hi_t - lo_t) * G
            in_flight.append((lo_t, hi_t, n, col_idx, mm))
            if len(in_flight) >= PIPELINE_DEPTH:
                out = drain_one()
                if out:
                    yield from out
        while in_flight:
            out = drain_one()
            if out:
                yield from out

    def _host_chunk(self, lo_t, hi_t, guide_longs, max_mismatch):
        from ..bitcoding import BitEncoding
        enc = BitEncoding(self.db.pack)
        mm = enc.mismatches_cross(self.db.targets[lo_t:hi_t], np.asarray(guide_longs, dtype=np.uint64))
        hits = mm <= max_mismatch
        t_idx, g_idx = np.nonzero(hits)
        if t_idx.size:
            yield t_idx + lo_t, g_idx, mm[t_idx, g_idx].astype(np.int8)


def scan_database_jax(db: Database, guide_longs: np.ndarray, max_mismatch: int,
                      stats, bin_mask: Optional[np.ndarray]):
    """Entry point used by the engine: one-shot scanner."""
    scanner = DeviceScanner(db)
    return scanner.scan(guide_longs, max_mismatch, bin_mask, stats)
