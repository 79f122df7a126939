"""`folding` metric tests, ported from the reference's RNAFold4jTest.scala."""

import pytest

from flashfry_tpu.scoring.rnafold import RNAFold4j, fold_mfe
from flashfry_tpu.standards import Cas9ParameterPack, Cpf1ParameterPack


def test_golden_mfes():
    # RNAFold4jTest.scala:24-29 — values from rnafold4j / ViennaRNA 1.8.5
    assert fold_mfe("AGTACTCGAGTACTTCC") == pytest.approx(-3.5, abs=1e-3)
    assert fold_mfe("AAGTACTCGAGTACTTCC") == pytest.approx(-4.4, abs=1e-3)
    assert fold_mfe("GGAAGTACTCGAGTACTTCC") == pytest.approx(-10.5, abs=1e-3)
    assert fold_mfe("GCCAGGAAGTACTCGAGTACTTCC") == pytest.approx(-10.7, abs=1e-3)


def test_unstructured_and_short():
    assert fold_mfe("AAAAAAAAAAAAAAAAAAAA") == 0.0   # no pairs possible
    assert fold_mfe("ACGU") == 0.0                   # below min hairpin span
    assert fold_mfe("") == 0.0


def test_rna_dna_equivalence():
    assert fold_mfe("GGAAGUACUCGAGUACUUCC") == fold_mfe("GGAAGTACTCGAGTACTTCC")


def test_gc_hairpin_is_stable():
    # strong GC stem with a stable UUCG tetraloop must fold well below zero
    assert fold_mfe("GGGGCUUCGGCCCC") < -5.0


def test_model_columns_and_scoring():
    m = RNAFold4j()
    assert m.valid_over_enzyme(Cas9ParameterPack)
    m.smallest_guide = 20
    m.setup()
    assert m.header_columns() == ["FreeEnergy20"]

    class FakeGuide:
        bases = "GCCAGGAAGTACTCGAGTACTTCC"[:20] + "TGG"  # 20mer guide + PAM

    scores = m.score_guide(FakeGuide())
    assert len(scores) == 1 and len(scores[0]) == 1
    assert float(scores[0][0]) == fold_mfe(FakeGuide.bases[:20])


def test_model_multiple_lengths():
    m = RNAFold4j()
    m.valid_over_enzyme(Cas9ParameterPack)
    m.smallest_guide = 18
    m.setup()
    assert m.header_columns() == ["FreeEnergy18", "FreeEnergy19", "FreeEnergy20"]

    m5 = RNAFold4j()
    m5.valid_over_enzyme(Cpf1ParameterPack)
    m5.smallest_guide = 19
    m5.setup()
    # 5' PAM: guide slices start after the PAM (RNAFold4j.scala:33-36)
    ln, start, stop = m5._length_positions[0]
    assert (ln, start, stop) == (19, Cpf1ParameterPack.guide_range[0],
                                 Cpf1ParameterPack.guide_range[0] + 19)
