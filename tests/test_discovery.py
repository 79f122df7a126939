"""Site-discovery tests, ported from the reference's SimpleSiteFinderTest.scala."""

import numpy as np

from flashfry_tpu.discovery import find_target_sites
from flashfry_tpu.standards import (Cas9NAGParameterPack, Cas9NGGParameterPack,
                                    Cas9ParameterPack, Cpf1ParameterPack)
from flashfry_tpu.utils import reverse_comp_string


def scan(seq, pack, flank=0, name="testContig"):
    return find_target_sites(iter([(name, seq)]), pack,
                             flanking_sequence=flank, capture_context=True)


def s(x):
    return x.replace(" ", "")


def test_find_ngg_site():
    # SimpleSiteFinderTest.scala:13-26
    string = s("ATTTA AAAAA CCCCC AAAAA GGG")
    sites = scan(string, Cas9NGGParameterPack)
    assert len(sites) == 1
    assert sites.bases()[0] == string
    assert sites.contexts[0] is not None


def test_find_context():
    # SimpleSiteFinderTest.scala:28-42
    guide = s("ATTTA AAAAA TTTTT AAAAA AGG")
    string = s("ATA ATATA ATTTA AAAAA TTTTT AAAAA AGG AATTA AAT")
    sites = scan(string, Cas9NGGParameterPack, flank=8)
    assert len(sites) == 1
    assert sites.bases()[0] == guide
    assert sites.contexts[0] == string
    assert int(sites.positions[0]) == 8


def test_find_rc_ngg_site():
    # SimpleSiteFinderTest.scala:44-55
    string = s("CCTTA AAAAA CCCCC AAAAA AAA")
    sites = scan(string, Cas9NGGParameterPack)
    assert len(sites) == 1
    assert sites.bases()[0] == reverse_comp_string(string)
    assert not bool(sites.forward[0])


def test_find_two_overlapping_cas9_sites():
    # SimpleSiteFinderTest.scala:57-71 — overlapping matches found
    string = s("A ATTTA AAAAA CCCCC AAAAA GGG")
    sites = scan(string, Cas9NGGParameterPack)
    assert len(sites) == 2
    assert sites.bases()[0] == string[0:23]
    assert sites.bases()[1] == string[1:24]


def test_find_nag_site():
    # SimpleSiteFinderTest.scala:73-84
    string = s("ATTTA AAAAA CCCCC AAAAA GAG")
    sites = scan(string, Cas9NAGParameterPack)
    assert len(sites) == 1
    assert sites.bases()[0] == string


def test_find_rc_nag_site():
    # SimpleSiteFinderTest.scala:86-97
    string = s("CTTTA AAAAA CCCCC AAAAA AAA")
    sites = scan(string, Cas9NAGParameterPack)
    assert len(sites) == 1
    assert sites.bases()[0] == reverse_comp_string(string)


def test_find_two_nxg_sites():
    # SimpleSiteFinderTest.scala:98-112 — combined NGG|NAG pack
    string = s("A ATTTA AAAAA CCCCC AAAAA AGG")
    sites = scan(string, Cas9ParameterPack)
    assert len(sites) == 2
    assert sites.bases()[0] == string[0:23]
    assert sites.bases()[1] == string[1:24]


def test_cpf1_like_fwd_detection():
    # SimpleSiteFinderTest.scala:114-125 (actually an NGG scan in the original)
    string = s("AAATA AAAAA CCCCC AAAAA GGG")
    sites = scan(string, Cas9NGGParameterPack)
    assert len(sites) == 1
    assert sites.bases()[0] == string


def test_find_two_cpf1_sites():
    # SimpleSiteFinderTest.scala:127-141
    string = s("TTTTA ATTTA AAAAA CCCCC AATTT")
    sites = scan(string, Cpf1ParameterPack)
    assert len(sites) == 2
    assert sites.bases()[0] == string[0:24]
    assert sites.bases()[1] == string[1:25]


def test_find_two_rc_cpf1_sites():
    # SimpleSiteFinderTest.scala:143-157
    string = s("TAATA ATTTA AAAAA CCCCC AAAAA")
    sites = scan(string, Cpf1ParameterPack)
    assert len(sites) == 2
    assert sites.bases()[0] == reverse_comp_string(string[0:24])
    assert sites.bases()[1] == reverse_comp_string(string[1:25])


def test_no_context_when_insufficient():
    # SimpleSiteFinderTest.scala:160-173
    string = s("ATTTA AAAAA CCCCC AAAAA GGG")
    sites = scan(string, Cas9NGGParameterPack, flank=1)
    assert len(sites) == 1
    assert sites.contexts[0] is None


def test_n_bases_drop_windows():
    # the reference regexes only admit ACGT, so N-containing windows vanish
    string = s("ATTTA AANAA CCCCC AAAAA GGG")
    sites = scan(string, Cas9NGGParameterPack)
    assert len(sites) == 0


def test_fwd_then_rev_ordering_per_contig():
    # ReferenceEncoder.scala:121-164 — fwd sites first, then rev
    fwd = s("ATTTA AAAAA CCCCC AAAAA GGG")
    rev = s("CCTTA AAAAA CCCCC AAAAA AAA")
    string = rev + "AAAA" + fwd
    sites = scan(string, Cas9NGGParameterPack)
    assert len(sites) > 2
    flags = sites.forward.tolist()
    # all forward sites come before all reverse sites
    assert flags == sorted(flags, reverse=True)
    # and within each strand group, positions ascend
    pos = sites.positions
    n_f = sum(flags)
    assert pos[:n_f].tolist() == sorted(pos[:n_f].tolist())
    assert pos[n_f:].tolist() == sorted(pos[n_f:].tolist())


def test_position_longs_roundtrip():
    string = s("ATTTA AAAAA CCCCC AAAAA GGG")
    sites = scan(string, Cas9NGGParameterPack)
    pl = sites.position_longs()
    bp = sites.bit_position
    contig, start, size, fwd = bp.decode(int(pl[0]))
    assert contig == "testContig"
    assert start == 0
    assert size == 23
    assert fwd


def test_reference_dict_reader(tmp_path):
    """.dict sequence-dictionary parsing (ReferenceDictReader.scala:29-47)."""
    from flashfry_tpu.refdict import ReferenceDictReader
    p = tmp_path / "ref.dict"
    p.write_text(
        "@HD\tVN:1.6\n"
        "@SQ\tSN:chr1\tLN:248956422\tM5:abc\n"
        "@SQ\tSN:chr2\tLN:242193529\n"
        "@PG\tID:x\n")
    rd = ReferenceDictReader(str(p))
    entries = list(rd)
    assert [(e.seq_name, e.length) for e in entries] == \
        [("chr1", 248956422), ("chr2", 242193529)]
    bp = rd.generate_bit_position()
    assert bp.contig_names_in_order == ["chr1", "chr2"]
    assert bp.contig_map["chr1"] == 1


def _random_library(rng, n_records, pack):
    """Random tiny FASTA records seeded with real sites, N bases, and
    contig-edge sites to stress the fused path's boundary handling."""
    bases = np.array(list("ACGT"))
    records = []
    for i in range(n_records):
        n = int(rng.integers(pack.total_scan_length - 2, 60))
        seq = "".join(bases[rng.integers(0, 4, size=n)])
        r = rng.random()
        if r < 0.15:  # splice an N somewhere
            k = int(rng.integers(0, max(1, len(seq))))
            seq = seq[:k] + "N" + seq[k + 1:]
        elif r < 0.3:  # force a PAM at the very end (edge site)
            pam = pack.pam[0]
            if pack.five_prime_pam:
                seq = pam.replace("N", "A") + seq[len(pam):]
            else:
                seq = seq[:-len(pam)] + pam.replace("N", "G")
        records.append(("rec%05d" % i, seq))
    return records


def test_fused_scan_matches_percontig():
    """The >=64-record fused scan is a pure optimization: byte-identical
    columns and contexts vs the per-contig oracle, for 3' and 5' PAM packs."""
    from flashfry_tpu.discovery import (_find_target_sites_fused,
                                        _find_target_sites_percontig)
    rng = np.random.default_rng(11)
    for pack in (Cas9NGGParameterPack, Cpf1ParameterPack):
        records = _random_library(rng, 200, pack)
        a = _find_target_sites_percontig(iter(records), pack,
                                         flanking_sequence=6,
                                         capture_context=True)
        b = _find_target_sites_fused(records, pack,
                                     flanking_sequence=6,
                                     capture_context=True)
        assert len(a) == len(b) > 100
        np.testing.assert_array_equal(a.contig_ids, b.contig_ids)
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.forward, b.forward)
        np.testing.assert_array_equal(a.sequences, b.sequences)
        assert a.contexts == b.contexts
        assert a.bases() == b.bases()
        assert a.contig_names == b.contig_names


def test_fused_scan_no_context():
    from flashfry_tpu.discovery import (_find_target_sites_fused,
                                        _find_target_sites_percontig)
    rng = np.random.default_rng(12)
    records = _random_library(rng, 80, Cas9NGGParameterPack)
    a = _find_target_sites_percontig(iter(records), Cas9NGGParameterPack)
    b = _find_target_sites_fused(records, Cas9NGGParameterPack)
    np.testing.assert_array_equal(a.sequences, b.sequences)
    np.testing.assert_array_equal(a.position_longs(), b.position_longs())


def test_scan_stats_targets_and_positions():
    from flashfry_tpu.database import build_database_from_sites
    from flashfry_tpu.engine import ScanStats, discover
    import numpy as np
    rng = np.random.default_rng(5)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=40_000))
    sites = scan(genome, Cas9NGGParameterPack)
    db = build_database_from_sites(sites, 7)
    gsites = scan(genome[1000:1400], Cas9NGGParameterPack)
    stats = ScanStats()
    discover(db, gsites, max_mismatch=4, backend="numpy", stats=stats)
    assert stats.all_targets_and_positions == int(db.pos_offsets[-1])
    assert stats.all_targets == db.num_targets


def test_fused_path_accepts_bytes_contigs():
    """bytes-like contigs must work on BOTH dispatch paths: the per-contig
    path (index phase) and the fused many-record path (>=64 contigs —
    round-5 review finding: only the per-contig path handled bytes)."""
    import numpy as np
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.standards import Cas9NGGParameterPack

    rng = np.random.default_rng(9)
    contigs_str = [("c%d" % i,
                    "".join("ACGT"[c] for c in rng.integers(0, 4, size=60)))
                   for i in range(80)]  # >= FUSED_SCAN_MIN_CONTIGS
    contigs_bytes = [(n, s.encode("ascii")) for n, s in contigs_str]
    a = find_target_sites(iter(contigs_str), Cas9NGGParameterPack)
    b = find_target_sites(iter(contigs_bytes), Cas9NGGParameterPack)
    assert len(a) > 0
    assert np.array_equal(a.sequences, b.sequences)
    assert np.array_equal(a.positions, b.positions)
    assert np.array_equal(a.forward, b.forward)
    assert np.array_equal(a.contig_ids, b.contig_ids)
