"""Backend parity for the batched per-OT scoring layer (scoring/otbatch.py).

The contract: numpy (oracle), native (ff_score_ots) and device (descriptor
extraction + host epilogue) produce BIT-IDENTICAL per-OT f64 score columns
and differs flags — the formatted output depends on the last ulp
(reference Doench2016CFDScore.scala:132-151,
CrisprMitEduOffTarget.scala:107-148, JostAndSantosCRISPRi.scala:92-127).
"""

import numpy as np
import pytest

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.scoring.off_target import (CrisprMitEduOffTarget,
                                             Doench2016CFDScore,
                                             JostAndSantosCRISPRi)
from flashfry_tpu.scoring.otbatch import (OTScoreBatch, get_batch,
                                          unpack_descriptors)
from flashfry_tpu.standards import Cas9NGGParameterPack as PACK


def _fixture(n=20000, g=32, seed=11, max_planted_mm=6):
    rng = np.random.default_rng(seed)
    enc = BitEncoding(PACK)
    L = PACK.total_scan_length

    def rand_longs(k):
        seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=L))
                for _ in range(k)]
        return enc.encode_batch(seqs)

    glongs = rand_longs(g)
    flat = rand_longs(n)
    gi = rng.integers(0, g, size=n).astype(np.int64)
    # half the OTs are guides mutated at 0..max_planted_mm positions, so the
    # low-mismatch region (where descriptors live) is densely exercised
    half = n // 2
    base = glongs[gi[:half]] & np.uint64(0xFFFFFFFFFFFF)
    for i in range(half):
        s = int(base[i])
        for _ in range(int(rng.integers(0, max_planted_mm + 1))):
            p = int(rng.integers(0, L))
            s ^= int(rng.integers(1, 4)) << (2 * (L - 1 - p))
        flat[i] = np.uint64(s)
    flat |= rng.integers(1, 100, size=n).astype(np.uint64) << np.uint64(48)
    act = np.asarray(PACK.comparison_mask_positions(), np.int32)
    return flat, gi, glongs, L, act


def _columns(be, flat, gi, glongs, L, act):
    cfd = Doench2016CFDScore()
    hsu = CrisprMitEduOffTarget()
    jost = JostAndSantosCRISPRi()
    jost._pack = PACK
    b = OTScoreBatch(flat, gi, glongs, L, act)
    b._backend = be
    c, d1 = b._column("cfd", cfd_tables=(cfd._mm_table, cfd._pam_table))
    h, d2 = b._column("hsu", hsu_tables=(hsu._one_minus, hsu._pam_table), gs=20)
    j, d3 = b._column("jost", jost_tables=(jost._table, 1))
    assert (d1 == d2).all() and (d1 == d3).all()
    return c, h, j, d1


@pytest.mark.parametrize("be", ["native", "device"])
def test_backend_bit_identical_to_numpy(be):
    fx = _fixture()
    want = _columns("numpy", *fx)
    got = _columns(be, *fx)
    for k, name in enumerate(["cfd", "hsu", "jost"]):
        assert (got[k].view(np.int64) == want[k].view(np.int64)).all(), \
            "%s %s column diverges from the numpy oracle" % (be, name)
    assert (got[3] == want[3]).all()


def test_device_descriptor_overflow_rows_recomputed():
    """OTs with >6 mismatches overflow the descriptor packing; the device
    backend must fall back to the exact numpy computation for those rows."""
    fx = _fixture(n=4000, seed=7, max_planted_mm=12)
    flat, gi, glongs, L, act = fx
    want = _columns("numpy", *fx)
    got = _columns("device", *fx)
    # the fixture's random half guarantees many rows with > 6 mismatches
    from flashfry_tpu.scoring.device import extract_descriptors
    w0, w1 = extract_descriptors(flat, gi, glongs, L, act)
    _, _, _, _, overflow, _ = unpack_descriptors(w0, w1)
    assert overflow.sum() > 100
    for k in range(3):
        assert (got[k].view(np.int64) == want[k].view(np.int64)).all()


def test_get_batch_memoizes_across_models():
    flat, gi, glongs, L, act = _fixture(n=500)
    b1 = get_batch(flat, gi, glongs, L, act)
    b2 = get_batch(flat, gi, glongs, L, act)
    assert b1 is b2
    flat2 = flat.copy()
    flat2[0] ^= np.uint64(3)
    b3 = get_batch(flat2, gi, glongs, L, act)
    assert b3 is not b1


def test_empty_batch():
    z = np.zeros(0, np.uint64)
    act = np.asarray(PACK.comparison_mask_positions(), np.int32)
    b = OTScoreBatch(z, np.zeros(0, np.int64), np.zeros(1, np.uint64), 23, act)
    cfd = Doench2016CFDScore()
    s, d = b._column("cfd", cfd_tables=(cfd._mm_table, cfd._pam_table))
    assert s.size == 0 and d.size == 0


@pytest.mark.parametrize("be", ["native", "device"])
def test_jost_19mer_backend_parity(be):
    """The 19-mer cas9 packs (L=22, Jost positions keyed from plo=0) must
    be bit-identical across backends too (JostAndSantosCRISPRi.scala:92-127
    handles both lengths)."""
    from flashfry_tpu.standards import Cas9NGG19ParameterPack as P19
    rng = np.random.default_rng(4)
    enc = BitEncoding(P19)
    L = P19.total_scan_length
    n, g = 5000, 16

    def rand_longs(k):
        seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=L))
                for _ in range(k)]
        return enc.encode_batch(seqs)

    glongs = rand_longs(g)
    flat = rand_longs(n)
    gi = rng.integers(0, g, size=n).astype(np.int64)
    half = n // 2
    base = glongs[gi[:half]] & np.uint64(0xFFFFFFFFFFFF)
    for i in range(half):
        s = int(base[i])
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, L))
            s ^= int(rng.integers(1, 4)) << (2 * (L - 1 - p))
        flat[i] = np.uint64(s)
    flat |= np.uint64(1) << np.uint64(48)
    act = np.asarray(sorted(P19.comparison_mask_positions()), np.int32)
    assert act.shape[0] == 19 and (act == np.arange(19)).all()

    jost = JostAndSantosCRISPRi()
    jost._pack = P19
    plo = jost._lo()
    assert plo == 0

    cols = {}
    for b in ("numpy", be):
        bt = OTScoreBatch(flat, gi, glongs, L, act)
        bt._backend = b
        cols[b] = bt._column("jost", jost_tables=(jost._table, plo))
    assert (cols[be][0].view(np.int64)
            == cols["numpy"][0].view(np.int64)).all()
    assert (cols[be][1] == cols["numpy"][1]).all()


def test_flat_cache_invalidates_when_ot_sets_change():
    """Re-scoring the same guide objects after their OT sets were refilled
    (set_ots_arrays installs a new array tuple) must NOT serve the stale
    flatten memo (round-4 review finding)."""
    from flashfry_tpu.scoring.base import (clear_flat_cache,
                                           flatten_guide_ots_cached)
    from flashfry_tpu.targetio import GuideWithOffTargets
    clear_flat_cache()
    guides = [GuideWithOffTargets("c", i, "A" * 23, True, None,
                                  (1 << 48) | i) for i in range(4)]
    for i, g in enumerate(guides):
        longs = np.arange(i + 1, dtype=np.uint64) | (np.uint64(1) << np.uint64(48))
        g.set_ots_arrays(longs, longs.copy(),
                         np.arange(i + 2, dtype=np.int64))
    flat1, off1, _, _ = flatten_guide_ots_cached(guides)
    # same objects, same lengths per guide, NEW arrays with different values
    for i, g in enumerate(guides):
        longs = (np.arange(i + 1, dtype=np.uint64) + np.uint64(77)) \
            | (np.uint64(1) << np.uint64(48))
        g.set_ots_arrays(longs, longs.copy(),
                         np.arange(i + 2, dtype=np.int64))
    flat2, off2, _, _ = flatten_guide_ots_cached(guides)
    assert np.array_equal(off1, off2)
    assert not np.array_equal(flat1, flat2), \
        "stale flatten memo served after OT refill"
    clear_flat_cache()
