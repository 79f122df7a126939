"""BED annotation (ported from BedAnnotationTest.scala), reciprocal
off-targets, and the extract / random CLI modules."""

import os
import subprocess
import sys

import pytest

from flashfry_tpu.bitcoding import BitEncoding
from flashfry_tpu.positions import BitPosition
from flashfry_tpu.scoring.annotations import BedAnnotation, ReciprocalOffTargets
from flashfry_tpu.standards import Cas9ParameterPack
from flashfry_tpu.targetio import GuideWithOffTargets

TEST_DATA = "/root/reference/test_data"


def make_guide(contig, start, bases):
    enc = BitEncoding(Cas9ParameterPack)
    return GuideWithOffTargets(contig=contig, start=start, bases=bases,
                               forward_strand=True, sequence_context=None,
                               long_encoding=enc.encode(bases))


def run_bed(guide, input_bed, genome_transform=""):
    model = BedAnnotation()
    model.input_bed = input_bed
    model.genome_transform = genome_transform
    model.setup()
    model.score_guides([guide], BitEncoding(Cas9ParameterPack), BitPosition(),
                       Cas9ParameterPack)
    return model


def test_bed_direct_contig_match():
    # BedAnnotationTest.scala:17-32
    guide = make_guide("chr8", 150, "GACTTGCATCCGAAGCCGGTGGG")
    run_bed(guide, "test:" + os.path.join(TEST_DATA, "test_overlap.bed"))
    assert guide.named_annotations["test"] == ["region1"]
    assert guide.start == 150


def test_bed_requires_file():
    # BedAnnotationTest.scala:34-45
    model = BedAnnotation()
    model.input_bed = ""
    with pytest.raises(ValueError):
        model.setup()


def test_bed_no_overlap_no_annotation():
    # BedAnnotationTest.scala:47-62
    guide = make_guide("chr7", 150000, "GACTTGCATCCGAAGCCGGTGGG")
    run_bed(guide, "test:" + os.path.join(TEST_DATA, "test_overlap.bed"))
    assert "test" not in guide.named_annotations


def test_bed_transform_then_annotate():
    # BedAnnotationTest.scala:64-81: guide on synthetic contig "1" at 50 is
    # remapped to chr8:10000+50 and then annotated with region2
    guide = make_guide("1", 50, "GACTTGCATCCGAAGCCGGTGGG")
    run_bed(guide, "test:" + os.path.join(TEST_DATA, "test_overlap.bed"),
            genome_transform=os.path.join(TEST_DATA, "remap_1_to_chr8:10000-15000.bed"))
    assert guide.contig == "chr8"
    assert guide.start == 10050
    assert guide.named_annotations["test"] == ["region2"]
    assert guide.named_annotations[BedAnnotation.OLD_CONTIG_TAG] == ["1"]


def test_reciprocal_off_targets():
    # ReciprocalOffTargets.scala:54-62: flag guides within maxMismatch of
    # each other (ignoring PAM bases via the comparison mask)
    g1 = make_guide("c", 0, "GACTTGCATCCGAAGCCGGTGGG")
    g2 = make_guide("c", 100, "GACTTGCATCCGAAGCCGGAAGG")  # 1 mm in guide
    g3 = make_guide("c", 200, "TTTTTTTTTTTTTTTTTTTTTGG")
    model = ReciprocalOffTargets()
    model.max_mismatch = 1
    model.score_guides([g1, g2, g3], BitEncoding(Cas9ParameterPack),
                       BitPosition(), Cas9ParameterPack)
    # each close guide is annotated with the OTHER guide's bases
    # (ReciprocalOffTargets.scala:54-62)
    assert g1.named_annotations["ReciprocalOffTargets"] == [g2.bases]
    assert g2.named_annotations["ReciprocalOffTargets"] == [g1.bases]
    assert "ReciprocalOffTargets" not in g3.named_annotations


# ---------------------------------------------------------------------------
# extract / random CLI modules
# ---------------------------------------------------------------------------

def run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    res = subprocess.run([sys.executable, "-m", "flashfry_tpu"] + list(args),
                         capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stderr
    return res


def test_extract_roundtrip(tmp_path):
    db = str(tmp_path / "db")
    out = str(tmp_path / "dump.fasta")
    run_cli("index", "--reference", os.path.join(TEST_DATA, "myc.fasta"),
            "--database", db, "--enzyme", "spcas9ngg")
    run_cli("extract", "--database", db, "--outputFile", out)
    lines = open(out).read().strip().split("\n")
    seqs = [l for l in lines if not l.startswith(">")]
    assert len(seqs) == 1206  # all myc targets (database is fully decodable)
    assert all(len(s) == 23 for s in seqs)

    # count filters restrict the dump
    out2 = str(tmp_path / "dump2.fasta")
    run_cli("extract", "--database", db, "--outputFile", out2,
            "--minInGenome", "2")
    seqs2 = [l for l in open(out2).read().strip().split("\n") if l and not l.startswith(">")]
    assert len(seqs2) < len(seqs)

    # the reference spells the database flag -binaryOTFile
    # (modules/DumpDatabase.scala:33-35); both spellings must work
    for flag in ("-binaryOTFile", "--binaryOTFile"):
        out3 = str(tmp_path / "dump3.fasta")
        run_cli("extract", flag, db, "--outputFile", out3)
        assert open(out3).read() == open(out).read()


def test_random_guides(tmp_path):
    out = str(tmp_path / "rand.fasta")
    run_cli("random", "--outputFile", out, "--enzyme", "spcas9ngg",
            "--randomCount", "25", "--seed", "11")
    lines = open(out).read().strip().split("\n")
    seqs = [l for l in lines if not l.startswith(">")]
    assert len(seqs) == 25
    assert all(len(s) == 23 and s.endswith("GG") for s in seqs)
    assert len(set(seqs)) == 25  # duplicates disallowed by default
