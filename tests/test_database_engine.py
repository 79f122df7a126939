"""Index build + discover engine tests against an independent brute-force
oracle (plain Python, no shared code paths)."""

import os
import re

import numpy as np
import pytest

from flashfry_tpu.bitcoding import BitEncoding, bin_index_to_string
from flashfry_tpu.database import (build_database_from_sites, load_database,
                                   save_database)
from flashfry_tpu.discovery import find_target_sites
from flashfry_tpu.engine import ScanStats, bin_guide_mask, discover
from flashfry_tpu.standards import Cas9NGGParameterPack, Cpf1ParameterPack
from flashfry_tpu.utils import reverse_comp_string

RNG = np.random.default_rng(1234)


def random_genome(n, seed=0):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def oracle_sites(seq, pam_fwd_re, pam_rev_re, L):
    """Independent site finder using Python's re with lookahead."""
    fwd = [m.start() for m in re.finditer(pam_fwd_re, seq)]
    rev = [m.start() for m in re.finditer(pam_rev_re, seq)]
    out = []
    for p in fwd:
        out.append((p, True, seq[p:p + L]))
    for p in rev:
        out.append((p, False, reverse_comp_string(seq[p:p + L])))
    return out


def hamming(a, b):
    return sum(1 for x, y in zip(a, b) if x != y)


def test_scanner_matches_regex_oracle_cas9ngg():
    seq = random_genome(20000, seed=5)
    sites = find_target_sites(iter([("c1", seq)]), Cas9NGGParameterPack)
    got = sorted(zip(sites.positions.tolist(), sites.forward.tolist()))
    # reference regexes: fwd ([ACGT])(?=([ACGT]{20}GG)); rev ([C])(?=(C[ACGT]{21}))
    oracle = oracle_sites(seq, r"(?=([ACGT]{21}GG))", r"(?=(CC[ACGT]{21}))", 23)
    expect = sorted((p, f) for p, f, _ in oracle)
    assert got == expect


def test_scanner_matches_regex_oracle_cpf1():
    seq = random_genome(20000, seed=6)
    sites = find_target_sites(iter([("c1", seq)]), Cpf1ParameterPack)
    got = sorted(zip(sites.positions.tolist(), sites.forward.tolist()))
    oracle = oracle_sites(seq, r"(?=(TTT[ACGT]{21}))", r"(?=([ACGT]{21}AAA))", 24)
    expect = sorted((p, f) for p, f, _ in oracle)
    assert got == expect


def build_small_db(seq, pack, bin_width=7):
    sites = find_target_sites(iter([("chrTest", seq)]), pack)
    return build_database_from_sites(sites, bin_width)


def test_database_sorted_dedup_and_bins():
    seq = random_genome(50000, seed=7)
    db = build_small_db(seq, Cas9NGGParameterPack)
    enc = db.bit_encoding()
    seqs, counts = enc.decode_batch(db.targets)
    # unique and sorted ascending (3' PAM: string sort == numeric sort)
    assert len(set(seqs)) == len(seqs)
    assert seqs == sorted(seqs)
    # counts equal position-list lengths
    assert (counts == np.diff(db.pos_offsets)).all()
    # bin CSR is consistent: every target's prefix-7 equals its bin
    bins = np.repeat(np.arange(db.num_bins), db.bin_target_counts())
    for i in range(0, db.num_targets, max(1, db.num_targets // 50)):
        assert seqs[i][:7] == bin_index_to_string(int(bins[i]), 7)


def test_database_save_load_roundtrip(tmp_path):
    seq = random_genome(30000, seed=8)
    db = build_small_db(seq, Cas9NGGParameterPack)
    path = str(tmp_path / "testdb")
    save_database(db, path)
    db2 = load_database(path)
    assert (db2.targets == db.targets).all()
    assert (db2.positions == db.positions).all()
    assert (db2.pos_offsets == db.pos_offsets).all()
    assert (db2.bin_start == db.bin_start).all()
    assert db2.contig_names == db.contig_names
    assert db2.pack.name == db.pack.name
    # header sidecar exists with FlashFry line format
    with open(path + ".header") as fh:
        lines = fh.read().split("\n")
    assert lines[0] == str(0x1234ABCDE123890)
    assert lines[1] == "1"
    assert lines[2] == "3"  # spcas9ngg enzyme index
    assert lines[3] == str(4 ** 7)


def test_discover_matches_brute_force():
    genome = random_genome(80000, seed=9)
    db = build_small_db(genome, Cas9NGGParameterPack)
    enc = db.bit_encoding()

    # guides: a few windows taken from the genome (guaranteed PAM sites)
    guide_fasta = genome[1000:3000]
    gsites = find_target_sites(iter([("guides", guide_fasta)]), Cas9NGGParameterPack,
                               flanking_sequence=6, capture_context=True)
    assert len(gsites) > 0

    stats = ScanStats()
    guides = discover(db, gsites, max_mismatch=4, backend="numpy", stats=stats)
    assert len(guides) == len(gsites)

    # independent oracle: hamming over bases [0:20] vs every decoded target
    tgt_seqs, tgt_counts = enc.decode_batch(db.targets)
    for g in guides[:8]:
        expect = []
        for ti, t in enumerate(tgt_seqs):
            mm = hamming(g.bases[:20], t[:20])
            if mm <= 4:
                expect.append((ti, t, int(tgt_counts[ti])))
        got = [(enc.decode(ot.sequence)) for ot in g.off_targets]
        assert [(t, c) for _, t, c in expect] == got
        # every guide should at least find itself (exact match in genome)
        assert any(hamming(g.bases[:20], t[:20]) == 0 for _, t, _ in expect)


def test_discover_overflow_cap_semantics():
    # build a genome with many repeats of one site to trigger the cap
    site = "GACGTACGTACGTACGTACGA"  # 21 bases; append GG PAM handled below
    core = "ACGTACGTACGTACGTACGA"
    genome_parts = []
    rng = np.random.default_rng(10)
    for i in range(50):
        # vary one base to create distinct sequences hitting the same guide
        m = list("G" + core)
        m[3] = "ACGT"[rng.integers(0, 4)]
        genome_parts.append("".join(m) + "GG" + "TTTT")
    genome = "".join(genome_parts)
    db = build_small_db(genome, Cas9NGGParameterPack)

    guide_fasta = "G" + core + "GG"
    gsites = find_target_sites(iter([("g", guide_fasta)]), Cas9NGGParameterPack,
                               flanking_sequence=0, capture_context=True)
    assert len(gsites) >= 1

    unlimited = discover(db, gsites, max_mismatch=4, maximum_off_targets=0, backend="numpy")
    total_positions = unlimited[0].ot_count_total()
    assert total_positions >= 10

    cap = max(2, total_positions // 2)
    capped = discover(db, gsites, max_mismatch=4, maximum_off_targets=cap, backend="numpy")
    g = capped[0]
    # accepted while current < cap, counting positions: replicate on the
    # unlimited list
    cum = 0
    expect_hits = []
    for ot in unlimited[0].off_targets:
        if cum < cap:
            expect_hits.append(ot.sequence)
            cum += ot.off_target_count
    assert [ot.sequence for ot in g.off_targets] == expect_hits
    assert g.full == (cum >= cap)


def test_bin_guide_mask_lossless():
    genome = random_genome(40000, seed=11)
    db = build_small_db(genome, Cas9NGGParameterPack)
    gsites = find_target_sites(iter([("g", genome[500:700])]), Cas9NGGParameterPack,
                               capture_context=True, flanking_sequence=0)
    if len(gsites) == 0:
        pytest.skip("no guides in window")
    pruned = discover(db, gsites, max_mismatch=3, backend="numpy", force_linear=False)
    dense = discover(db, gsites, max_mismatch=3, backend="numpy", force_linear=True)
    for a, b in zip(pruned, dense):
        assert [ot.sequence for ot in a.off_targets] == [ot.sequence for ot in b.off_targets]


def test_pruned_comparisons_device_equals_host():
    """The device (one-hot matmul) pruned counter must equal the host SWAR
    version exactly for both PAM orientations."""
    import numpy as np
    from flashfry_tpu.database import build_database_from_sites
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.engine import (pruned_comparisons,
                                     pruned_comparisons_device)
    from flashfry_tpu.standards import (Cas9NGGParameterPack,
                                        Cpf1ParameterPack)

    rng = np.random.default_rng(101)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, size=40000))
    for pack in (Cas9NGGParameterPack, Cpf1ParameterPack):
        sites = find_target_sites(iter([("chrT", genome)]), pack)
        db = build_database_from_sites(sites, 7)
        gsites = find_target_sites(iter([("g", genome[700:1900])]), pack)
        if len(gsites) == 0:
            continue
        guides = np.asarray(gsites.sequences)
        for mm in (3, 4, 5):
            want = pruned_comparisons(db, guides, mm)
            got = pruned_comparisons_device(db, guides, mm, guide_chunk=64)
            assert got == want and want > 0, (pack.name, mm)


def test_native_collect_matches_numpy_collect():
    """ff_collect_hits must reproduce the numpy collect exactly: grouping
    order, the overflow-cap accept rule (positions accumulate over ALL
    prior hits), coordinate lists, and current_total — including guides
    whose single multi-position target blows straight past the cap (the
    retry path for the coords buffer)."""
    import numpy as np
    from flashfry_tpu.bitcoding import BitEncoding
    from flashfry_tpu.database import build_database_from_sites
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.engine import _collect_hits
    from flashfry_tpu.standards import Cas9NGGParameterPack
    from flashfry_tpu.targetio import GuideWithOffTargets
    from flashfry_tpu import native as ffnative
    import os

    rng = np.random.default_rng(17)
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, size=40000))
    # plant a repeated segment so some targets carry many positions
    seg = base[1000:1400]
    genome = base + seg * 40
    sites = find_target_sites(iter([("chrT", genome)]), Cas9NGGParameterPack)
    db = build_database_from_sites(sites, 7)
    enc = BitEncoding(db.pack)

    n_g = 60
    gl = db.targets[rng.choice(db.num_targets, size=n_g, replace=False)]
    mm = enc.mismatches_cross(db.targets, gl)
    t, g = np.nonzero(mm <= 4)
    # arrival order: target-major per guide (as the scan yields)
    chunks = [(t, g, mm[t, g].astype(np.int8))]

    def make_guides(cap):
        return [GuideWithOffTargets("c", i, "A" * 23, True, None,
                                    int(x) | (1 << 48), overflow_cap=cap)
                for i, x in enumerate(gl)]

    if ffnative.get_native() is None:
        import pytest
        pytest.skip("native library unavailable")

    for cap in (0, 3, 25, 2000):
        ga = make_guides(cap)
        gb = make_guides(cap)
        _collect_hits(db, ga, iter(list(chunks)))  # native path
        os.environ["FLASHFRY_TPU_NO_NATIVE"] = "1"
        try:
            ffnative._lib_tried = True
            ffnative._lib = None
            _collect_hits(db, gb, iter(list(chunks)))  # numpy path
        finally:
            del os.environ["FLASHFRY_TPU_NO_NATIVE"]
            ffnative._lib_tried = False
        for a, b in zip(ga, gb):
            la, lb = a.ot_arrays(), b.ot_arrays()
            assert np.array_equal(la[0], lb[0]), cap
            assert np.array_equal(la[1], lb[1]), cap
            assert np.array_equal(la[2], lb[2]), cap
            assert a.current_total == b.current_total
            assert a.full == b.full
