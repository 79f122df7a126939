"""Scoring model golden tests, ported from the reference test suite
(values validated there against the original authors' Python code)."""

import numpy as np
import pytest

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.scoring.aggregate import AggregateRankedScore, SchulzeRank
from flashfry_tpu.scoring.annotations import ClosestHit, DangerousSequences
from flashfry_tpu.scoring.off_target import (CrisprMitEduOffTarget,
                                             Doench2016CFDScore,
                                             JostAndSantosCRISPRi)
from flashfry_tpu.scoring.on_target import CRISPRscan, Doench2014OnTarget
from flashfry_tpu.positions import BitPosition
from flashfry_tpu.standards import (Cas9ParameterPack, Cas9ParameterPack19bp,
                                    Cpf1ParameterPack)
from flashfry_tpu.targetio import GuideWithOffTargets, OffTargetHit

ENC = BitEncoding(Cas9ParameterPack)


def mk_guide(bases, context=None, pack=Cas9ParameterPack, contig="test", start=0):
    enc = BitEncoding(pack)
    return GuideWithOffTargets(
        contig=contig, start=start, bases=bases, forward_strand=True,
        sequence_context=context, long_encoding=enc.encode(bases),
        overflow_cap=1000)


def add_ots(guide, seqs, counts=None, pack=Cas9ParameterPack):
    enc = BitEncoding(pack)
    counts = counts or [1] * len(seqs)
    for s, c in zip(seqs, counts):
        guide.add_ot(OffTargetHit(enc.encode(s, c), np.zeros(c, dtype=np.uint64)))


# ---------------- Doench 2016 CFD (Doench2016CFDScoreTest.scala) ----------------

def test_cfd_pairwise_scores():
    d = Doench2016CFDScore()
    d.bit_encoder(ENC)
    guide = "GACTTGCATCCGAAGCCGGT"
    assert d.score_cfd(guide, "GACCTGCATACGAAGCCTTT") == pytest.approx(0.249237473, abs=1e-3)
    assert d.score_cfd(guide, "TTCTTGCATCAGAAGCCGCT") == pytest.approx(0.244514106, abs=1e-3)
    assert d.score_cfd(guide, "GACCTGCATCCAAAGCCAGA") == pytest.approx(0.235180995, abs=1e-3)
    assert d.score_cfd(guide, "GGCTGGCATCCCAAGCCAGT") == pytest.approx(0.187656109, abs=1e-3)
    assert d.score_cfd(guide, "GACTTGCCTCCCAAACCTGT") == pytest.approx(0.142362828, abs=1e-3)


def test_cfd_simple_guide_below_threshold():
    d = Doench2016CFDScore()
    d.bit_encoder(ENC)
    g = mk_guide("CGCGCGGCCCCAGTTCTGCGCAG")
    add_ots(g, ["AGCGCGGCCCCAGTGCCCCGTGG"])
    assert float(d.score_guide(g)[0][0]) == pytest.approx(0.0, abs=1e-3)


def test_cfd_guide_python_reference():
    d = Doench2016CFDScore()
    d.bit_encoder(ENC)
    ots = ["AAAAAGGTTGGGGATATTGCTGG", "AAAACTGCTTGGGATATAGCAGG", "AAAAGGATTTGGGATATGGGTGG",
           "AAAAGGGCTTGGAGTATAGCTGG", "AAAAGGGTATGGGATAAAACAGG", "AAAAGGGTCTGGCATACAGCAGG",
           "AAAAGGGTTGGGGATAGTGCTGG", "AAAAGGGTTTGGGAAGTAACAGG", "AAAAGGTCTTGGGATATAGGAGG",
           "AAAAGGTTTTGGAATATAGATGG", "AAAAGTGATTGGGATATAGTAGG", "AAAAGTGTTTGGGATATGGAAGG",
           "AACAAGGTTTGTGATATAGCAGG", "AATAGGGTCGGGGATATAGCAGG", "AGAAAGGTTTGGGATATTGCTGG",
           "AGAAGGCTTTGGGATATGGCTGG", "CAAAGGGATTGGGACATAGCTGG", "CAAAGGGTTTGGCATATAGATGG",
           "GAAAGGGTTTGGGATATCTCTGG"]
    g = mk_guide("AAAAGGGTTTGGGATATAGCTGG")
    add_ots(g, ots)
    assert float(d.score_guide(g)[0][0]) == pytest.approx(0.5238095242619047, abs=1e-3)


# ---------------- Doench 2014 (Doench2014OnTargetTest.scala) ----------------

def test_doench2014_golden_scores():
    d = Doench2014OnTarget()
    g1 = mk_guide("GTCAGCTGCCCCCACCTCCCTGG", "GGTTGTCAGCTGCCCCCACCTCCCTGGGCCCT")
    assert float(d.score_guide(g1)[0][0]) == pytest.approx(0.011271132331539457, abs=1e-3)
    g2 = mk_guide("GCTGCGATCTGAGGTAGGGAGGG", "TATAGCTGCGATCTGAGGTAGGGAGGGACCT")
    assert float(d.score_guide(g2)[0][0]) == pytest.approx(0.713089368437, abs=1e-3)
    g3 = mk_guide("CACCTGTCACGGTCGGGGCTTGG", "TCCGCACCTGTCACGGTCGGGGCTTGGCGCT")
    assert float(d.score_guide(g3)[0][0]) == pytest.approx(0.0189838463593, abs=1e-3)


# ---------------- Hsu 2013 / MIT (CrisprMitEduOffTargetTest.scala) ----------------

def test_hsu_aggregate_score():
    ots = ["GACCTGCATACGAAGCCTTTGGG", "TTCTTGCATCAGAAGCCGCTGGG", "GACCTGCATCCAAAGCCAGAGGG",
           "GGCTGGCATCCCAAGCCAGTAGG", "GACTTGCCTCCCAAACCTGTTGG", "GACTTGCATCAGAAGCACATAGG",
           "GACTTGGGTCCGAGGCCTGTGGG", "GAAATGCATCCTAAGCCGTTGGG", "GAAATGCATCCTAAGCCGTTGGG",
           "CACTAGCATCCCAGGCCGGTGGG", "GTCTTGCCTCCTAAGCCAGTTGG", "GAAATGCATCCTAAGCCGCTGGG",
           "GACTTGCATCAGCAGCCTTTTGG", "GACTTGCATCAGCAGCCTTTTGG", "GACTTGCATCAGCAGCCTTTTGG",
           "GACTTGCATCAGCAGCCTTTTGG", "GACTTGCATCAGCAGCCTTTTGG", "GAGCTGCATCCTAAGCTGGTTGG",
           "GACTTACATCCGAAGGAGTTGGG", "GACTTGGAGCCGAAGTCGCTGGG", "GACTTGCAGCTGTAGCCGTTTGG",
           "GACGTGCATCCGCTGCTGGTGGG", "GATGTGCATCAGAAGCCGGCAGG", "GACTGGCATCTGAAGTTGGTTGG",
           "GCCTTGCCTCCGAAGCTGGGTGG", "GACTTGCATCTGAATCCATTTGG", "GACTTGCATCCTAATGTGGTGGG",
           "GACTTGCATTTGAAGGGGGTGGG", "GACTTTCATACAAAGCCGGTAGG", "CACTGGCATCTGAAGCCGGTGAG"]
    g = mk_guide("GACTTGCATCCGAAGCCGGTGGG", contig="1", start=1)
    for s in ots:
        g.add_ot(OffTargetHit(ENC.encode(s, 1), np.zeros(0, dtype=np.uint64)))
    mit = CrisprMitEduOffTarget()
    mit.bit_encoder(ENC)
    assert mit.score_crispr(g) == pytest.approx(96.0, abs=1.0)


def test_hsu_single_off_target():
    g = mk_guide("TTGTTTCCAGGTCAATGTGACGG", contig="1", start=1)
    ot = OffTargetHit(ENC.encode("TTGTCTTCAAGTCAATATGATGG", 1), np.zeros(0, dtype=np.uint64))
    mit = CrisprMitEduOffTarget()
    mit.bit_encoder(ENC)
    assert mit.score_off_target(g, ot) == pytest.approx(0.36403873, abs=0.1)


# ---------------- CRISPRscan (CRISPRScanTest.scala) ----------------

def test_crisprscan_golden_scores():
    m = CRISPRscan()
    g1 = mk_guide("GGTGGCGCTGCTGGATGGACGGG", "TCCTCTGGTGGCGCTGCTGGATGGACGGGACTGTA")
    assert float(m.score_guide(g1)[0][0]) == pytest.approx(0.77, abs=0.005)
    g2 = mk_guide("GGTGGGGCTGAAAGATGGACGGG", "TCCTCTGGTGGGGCTGAAAGATGGACGGGTTTGTA")
    assert float(m.score_guide(g2)[0][0]) == pytest.approx(0.68, abs=0.005)


def test_crisprscan_context_validation():
    m = CRISPRscan()
    ok = mk_guide("GGTGGGGCTGAAAGATGGACGGG", "TCCTCTGGTGGGGCTGAAAGATGGACGGGTTTGTA")
    assert m.valid_over_target_sequence(Cas9ParameterPack, ok)
    short_left = mk_guide("GGTGGGGCTGAAAGATGGACGGG", "CCTCTGGTGGGGCTGAAAGATGGACGGGTTTGTA")
    assert not m.valid_over_target_sequence(Cas9ParameterPack, short_left)


# ---------------- Jost & Santos (JoistAndSantosCRISPRiTest.scala) ----------------

def test_jost_calc_scores():
    d = JostAndSantosCRISPRi()
    d.valid_over_enzyme(Cas9ParameterPack)
    d.bit_encoder(ENC)
    t = "AAAAAAAAAAAAAAAAAAAAGGG"
    assert d.calc_score(t, "TAAAAAAAAAAAAAAAAAAAGGG") == 1.0
    assert d.calc_score(t, "ATAAAAAAAAAAAAAAAAAAGGG") == 0.7952747759038213
    assert d.calc_score(t, "AAAATAAAATAAAAGAAAAAGGG") == pytest.approx(
        0.6947382165440157 * 0.31016952886752025 * 0.26865890093507167, rel=1e-12)
    assert d.calc_score(t, "ATAAAAAAAAAAAAAAAAATGGG") == pytest.approx(
        0.7952747759038213 * 0.03182081449682617, rel=1e-12)


def test_jost_excludes_exact_match():
    d = JostAndSantosCRISPRi()
    d.valid_over_enzyme(Cas9ParameterPack)
    d.bit_encoder(ENC)
    g = mk_guide("AAAAAAAAAAAAAAAAAAAAGGG")
    add_ots(g, ["AAAAAAAAAAAAAAAAAAAAGGG"])
    assert d.score_guide(g)[0] == ["0.0"]


def test_jost_pam_proximal_change_is_perfect():
    d = JostAndSantosCRISPRi()
    d.valid_over_enzyme(Cas9ParameterPack)
    d.bit_encoder(ENC)
    g = mk_guide("AAAAAAAAAAAAAAAAAAAAAGG")
    add_ots(g, ["TAAAAAAAAAAAAAAAAAAAAGG"])
    assert d.score_guide(g)[0] == ["1.0"]


def test_jost_19mer():
    enc19 = BitEncoding(Cas9ParameterPack19bp)
    d = JostAndSantosCRISPRi()
    d.valid_over_enzyme(Cas9ParameterPack19bp)
    d.bit_encoder(enc19)
    t = "AAAAAAAAAAAAAAAAAAAGGG"
    assert d.calc_score(t, "AAATAAAATAAAAGAAAAAGGG") == pytest.approx(
        d._mean[(4, "T", "T")] * d._mean[(9, "T", "T")] * d._mean[(14, "G", "T")], rel=1e-12)


# ---------------- Dangerous (DangerousSequencesTest.scala) ----------------

def test_dangerous_polyt():
    d = DangerousSequences()
    d.bit_encoder(ENC)
    g = mk_guide("AAAAACCCCCGGGGGTTTTAGGG")
    assert [v[0] for v in d.score_guide(g)] == ["NONE", "PolyT", "NONE"]
    g2 = mk_guide("AAAAACCCCCGGGGGTATTTTGG")
    assert [v[0] for v in d.score_guide(g2)] == ["NONE", "NONE", "NONE"]


def test_dangerous_polyt_cpf1():
    enc = BitEncoding(Cpf1ParameterPack)
    d = DangerousSequences()
    d.bit_encoder(enc)
    g = mk_guide("TTTGAAAAACCCCCGGGGGTTTTA", pack=Cpf1ParameterPack)
    assert [v[0] for v in d.score_guide(g)] == ["NONE", "PolyT", "NONE"]


def test_dangerous_gc_and_in_genome():
    d = DangerousSequences()
    d.bit_encoder(ENC)
    g = mk_guide("AAAAAAAAAAAAAAAAAAAAAGG")
    add_ots(g, ["AAAAAAAAAAAAAAAAAAAAAGG"], counts=[7])
    vals = [v[0] for v in d.score_guide(g)]
    assert vals[0].startswith("GC_")
    assert vals[2] == "IN_GENOME=7"


# ---------------- ClosestHit (ClosestHitTest.scala) ----------------

def _mutated(seq, n_mm, positions):
    s = list(seq)
    for p in positions[:n_mm]:
        s[p] = {"A": "C", "C": "A", "G": "T", "T": "G"}[s[p]]
    return "".join(s)


def test_closest_hit_counts():
    seq = "GACTTGCATCCGAAGCCGGTGGG"
    ch = ClosestHit()
    ch.bit_encoder(ENC)

    g = mk_guide(seq, contig="chr8", start=150)
    add_ots(g, [_mutated(seq, 1, [3])], counts=[1])
    scored = ch.score_guide(g)
    assert scored[0] == ["1"] and scored[1] == ["1"] and scored[2] == ["0,1,0,0,0"]

    g = mk_guide(seq, contig="chr8", start=150)
    add_ots(g, [_mutated(seq, 1, [3])], counts=[40])
    scored = ch.score_guide(g)
    assert scored[0] == ["1"] and scored[1] == ["40"] and scored[2] == ["0,40,0,0,0"]

    g = mk_guide(seq, contig="chr8", start=150)
    add_ots(g, [_mutated(seq, 1, [3]), _mutated(seq, 1, [5]),
                _mutated(seq, 2, [3, 5]), _mutated(seq, 4, [1, 3, 5, 7])],
            counts=[40, 30, 20, 10])
    scored = ch.score_guide(g)
    assert scored[0] == ["1"] and scored[1] == ["70"] and scored[2] == ["0,70,20,0,10"]


# ---------------- Aggregate rank (AggregateRankedScoreTest.scala) ----------------

class FakeRanked:
    def __init__(self, name, high_good):
        self._name = name
        self.high_score_is_good = high_good
        self.counter = 0

    def score_name(self):
        return self._name

    def header_columns(self):
        return [self._name]

    def score_guides(self, guides, *a):
        for g in guides:
            self.counter += 1
            g.named_annotations[self._name] = [str(self.counter)]


def fake_guides(n):
    return [mk_guide("GACTTGCATCCGAAGCCGGTGGG", contig=str(i), start=150) for i in range(n)]


def test_aggregate_rank_descending():
    guides = fake_guides(5)
    f1 = FakeRanked("fakeRankBestHigh", True)
    f1.score_guides(guides)
    agg = AggregateRankedScore()
    agg.initialize_score_names([f1])
    agg.score_guides(guides, ENC, BitPosition(), Cas9ParameterPack)
    tranche_expect = {5: 1, 4: 2, 3: 3, 2: 4, 1: 4}
    target_rank = 5
    for g in guides:
        assert g.named_annotations["AggregateRankedScore_tranche"] == [str(tranche_expect[int(g.contig) + 1])]
        assert g.named_annotations["AggregateRankedScore_medianRank"] == [str(target_rank)]
        target_rank -= 1


def test_aggregate_rank_reverse_metric():
    guides = fake_guides(5)
    f2 = FakeRanked("fakeRankBestLow", False)
    f2.score_guides(guides)
    agg = AggregateRankedScore()
    agg.initialize_score_names([f2])
    agg.score_guides(guides, ENC, BitPosition(), Cas9ParameterPack)
    tranche_expect = {5: 4, 4: 4, 3: 3, 2: 2, 1: 1}
    target_rank = 1
    for g in guides:
        assert g.named_annotations["AggregateRankedScore_tranche"] == [str(tranche_expect[target_rank])]
        assert g.named_annotations["AggregateRankedScore_medianRank"] == [str(target_rank)]
        target_rank += 1


def test_aggregate_rank_two_consistent_systems():
    guides = fake_guides(100)
    f1 = FakeRanked("fakeRankBestHigh", True)
    f2 = FakeRanked("fakeRankBestLow", False)
    f1.score_guides(guides)
    f2.score_guides(list(reversed(guides)))
    agg = AggregateRankedScore()
    agg.initialize_score_names([f1, f2])
    agg.score_guides(guides, ENC, BitPosition(), Cas9ParameterPack)
    target_rank = 100
    for g in guides:
        assert g.named_annotations["AggregateRankedScore_medianRank"] == [str(target_rank)]
        target_rank -= 1


def test_aggregate_rank_two_conflicting_systems():
    guides = fake_guides(100)
    f1 = FakeRanked("fakeRankBestHigh", True)
    f2 = FakeRanked("fakeRankBestLow", False)
    f1.score_guides(guides)
    f2.score_guides(guides)
    agg = AggregateRankedScore()
    agg.initialize_score_names([f1, f2])
    agg.score_guides(guides, ENC, BitPosition(), Cas9ParameterPack)
    for g in guides:
        assert g.named_annotations["AggregateRankedScore_tranche"] == ["3"]
        assert g.named_annotations["AggregateRankedScore_medianRank"] == ["51"]


def test_schulze_rank():
    # utils/SchulzeRankTest.scala:11-19
    votes = [([5, 5, 5, 5, 5], 1), ([2, 2, 2, 2, 2, 1], 1), ([3, 3, 3, 3, 3], 1),
             ([4, 4, 4, 4, 4], 1), ([1, 1, 1, 1, 1], 1)]
    rnk = SchulzeRank(votes)
    assert rnk.index_to_rns[0]["rank"] == 0
    assert rnk.index_to_rns[0]["score"] == 50


# ---------------- batched score_guides == per-guide score_guide ----------------

def test_batched_scoring_matches_per_guide():
    """The cross-guide batched score_guides paths (off_target.py,
    annotations.py) must reproduce the per-guide score_guide fold
    byte-for-byte — annotations AND per-OT score columns — on randomized
    guides with randomized OT sets (including 0-OT and exact-match-only
    guides)."""
    from flashfry_tpu.scoring.base import SingleGuideScoreModel
    enc = BitEncoding(Cas9ParameterPack)
    pos_enc = BitPosition()

    def build_guides():
        rng = np.random.default_rng(42)

        def rand_seq(n=23):
            return "".join("ACGT"[c] for c in rng.integers(0, 4, size=n))

        guides = []
        for gi in range(40):
            bases = rand_seq()
            g = mk_guide(bases, contig="c%d" % gi, start=gi * 31)
            n_ots = int(rng.integers(0, 12))
            seqs, counts = [], []
            if gi % 7 == 0:
                n_ots = 0                      # empty OT set
            for _ in range(n_ots):
                ot = list(bases)
                for _k in range(int(rng.integers(0, 5))):  # 0 mm = exact match
                    ot[int(rng.integers(0, 20))] = "ACGT"[int(rng.integers(0, 4))]
                seqs.append("".join(ot))
                counts.append(int(rng.integers(1, 5)))
            if seqs:
                add_ots(g, seqs, counts)
            guides.append(g)
        return guides

    for model_cls in (Doench2016CFDScore, CrisprMitEduOffTarget,
                      JostAndSantosCRISPRi, ClosestHit, DangerousSequences):
        a, b = build_guides(), build_guides()
        m1, m2 = model_cls(), model_cls()
        for m in (m1, m2):
            m.valid_over_enzyme(Cas9ParameterPack)
            m.bit_encoder(enc)
            m.setup()
        m1.score_guides(a, enc, pos_enc, Cas9ParameterPack)   # batched
        SingleGuideScoreModel.score_guides(m2, b, enc, pos_enc,
                                           Cas9ParameterPack)  # per-guide
        for ga, gb in zip(a, b):
            assert ga.named_annotations == gb.named_annotations, model_cls.__name__
            assert ga.ot_score_cols == gb.ot_score_cols, model_cls.__name__
