"""Annotation 'scores': dangerous sequences, closest hit, BED overlap,
reciprocal off-targets.

Counterparts of scoring/DangerousSequences.scala, scoring/ClosestHit.scala,
scoring/BedAnnotation.scala and scoring/ReciprocalOffTargets.scala.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..javafmt import java_double_to_string
from ..positions import overlap
from ..standards import ParameterPack
from ..utils import gc_content
from .base import ScoreModel, SingleGuideScoreModel


class DangerousSequences(SingleGuideScoreModel):
    """GC extremes, PolyT, in-genome exact-match count
    (DangerousSequences.scala:49-68)."""

    def __init__(self):
        self._enc = None
        self.clean_output = False

    def score_name(self) -> str:
        return "dangerous"

    def score_description(self) -> str:
        return "flag sequences that will be hard to create, or could confound analysis"

    def header_columns(self) -> List[str]:
        return ["dangerous_GC", "dangerous_polyT", "dangerous_in_genome"]

    def valid_over_enzyme(self, pack) -> bool:
        return True

    def valid_over_target_sequence(self, pack, guide) -> bool:
        return True

    def bit_encoder(self, bit_encoding) -> None:
        self._enc = bit_encoding

    def score_guide(self, guide) -> List[List[str]]:
        problems = ["0", "0", "0"] if self.clean_output else ["NONE", "NONE", "NONE"]
        gc = gc_content(guide.bases)
        if self.clean_output:
            problems[0] = java_double_to_string(gc)
        elif gc < 0.25 or gc > 0.75:
            problems[0] = "GC_" + java_double_to_string(gc)

        r0, r1 = self._enc.pack.guide_range
        if "TTTT" in guide.bases[r0:r1]:
            problems[1] = "1" if self.clean_output else "PolyT"

        longs, _, _, _ = guide.ot_arrays()
        if longs.shape[0]:
            mm = self._enc.mismatches(longs, np.uint64(guide.long_encoding))
            counts = (longs >> np.uint64(48)).astype(np.int64)
            in_genome = int(counts[mm == 0].sum())
            if in_genome > 0:
                problems[2] = str(in_genome) if self.clean_output else "IN_GENOME=" + str(in_genome)
        return [[p] for p in problems]

    def score_guides(self, guides, bit_enc, pos_enc, pack) -> None:
        """Batched: one flat mismatch pass for the IN_GENOME counts; GC and
        PolyT stay per-guide string checks (cheap)."""
        from .base import flatten_guide_ots_cached
        if not len(guides):
            return
        flat, offsets, glongs, gi = flatten_guide_ots_cached(guides)
        mm = self._enc.mismatches_indexed(flat, glongs, gi)
        exact = (flat >> np.uint64(48)).astype(np.int64) * (mm == 0)
        in_genome = np.bincount(gi, weights=exact.astype(np.float64),
                                minlength=len(guides)).astype(np.int64).tolist()

        r0, r1 = self._enc.pack.guide_range
        clean = self.clean_output
        for i, g in enumerate(guides):
            problems = ["0", "0", "0"] if clean else ["NONE", "NONE", "NONE"]
            gc = gc_content(g.bases)
            if clean:
                problems[0] = java_double_to_string(gc)
            elif gc < 0.25 or gc > 0.75:
                problems[0] = "GC_" + java_double_to_string(gc)
            if "TTTT" in g.bases[r0:r1]:
                problems[1] = "1" if clean else "PolyT"
            if in_genome[i] > 0:
                problems[2] = (str(in_genome[i]) if clean
                               else "IN_GENOME=" + str(in_genome[i]))
            for col, p in zip(self.header_columns(), problems):
                g.named_annotations[col] = [p]


class ClosestHit(SingleGuideScoreModel):
    """Minimum-mismatch off-target summary (ClosestHit.scala:43-76)."""

    MAX_MM_STORED = 4

    def __init__(self):
        self._enc = None

    def score_name(self) -> str:
        return "closest"

    def score_description(self) -> str:
        return "recorded the minimum number of mismatches to the set of off-targets"

    def header_columns(self) -> List[str]:
        return ["basesDiffToClosestHit", "closestHitCount", "0-1-2-3-4_mismatch"]

    def valid_over_enzyme(self, pack) -> bool:
        return True

    def valid_over_target_sequence(self, pack, guide) -> bool:
        return True

    def bit_encoder(self, bit_encoding) -> None:
        self._enc = bit_encoding

    def score_guide(self, guide) -> List[List[str]]:
        longs, _, _, _ = guide.ot_arrays()
        mm = self._enc.mismatches(longs, np.uint64(guide.long_encoding))
        oc = (longs >> np.uint64(48)).astype(np.int64)
        in_range = mm <= self.MAX_MM_STORED
        ot_counts = np.bincount(mm[in_range],
                                weights=oc[in_range].astype(np.float64),
                                minlength=self.MAX_MM_STORED + 1).astype(np.int64)
        hist = ",".join(str(int(c)) for c in ot_counts[:self.MAX_MM_STORED + 1])
        # the reference's branch structure (ClosestHit.scala:61-66):
        # zero-mismatch hits never set `closest`, so the result is the
        # minimum positive mismatch count and the summed occurrence count of
        # every OT at exactly that distance
        pos = mm[mm > 0]
        if pos.shape[0] == 0:
            return [["UNK"], ["0"], [hist]]
        closest = int(pos.min())
        count = int(oc[mm == closest].sum())
        return [[str(closest)], [str(count)], [hist]]

    def score_guides(self, guides, bit_enc, pos_enc, pack) -> None:
        """Batched: one flat mismatch pass + a (G x 5) histogram bincount;
        the closest-positive-distance fold runs over small list slices."""
        from .base import flatten_guide_ots_cached
        if not len(guides):
            return
        K = self.MAX_MM_STORED
        flat, offsets, glongs, gi = flatten_guide_ots_cached(guides)
        mm = self._enc.mismatches_indexed(flat, glongs, gi)
        occ = (flat >> np.uint64(48)).astype(np.int64)
        in_range = mm <= K
        hists = np.bincount(
            (gi[in_range] * (K + 1) + mm[in_range]).astype(np.int64),
            weights=occ[in_range].astype(np.float64),
            minlength=len(guides) * (K + 1)).astype(np.int64)
        hists = hists.reshape(len(guides), K + 1).tolist()

        # closest positive distance per guide, fully vectorized (the old
        # per-guide Python fold cost ~6 s at 100k guides x 18.7M OTs):
        # segment-min via minimum.reduceat over the guide-grouped flat
        # order, then one bincount for the occurrence sum at that distance
        n_g = len(guides)
        NOPOS = 255
        # sentinel append keeps every offsets value a valid reduceat index
        # (offsets[i] == n for trailing empty segments) without perturbing
        # any non-empty segment's range; the sentinel can never lower a min
        mmp = np.append(np.where(mm > 0, mm.astype(np.int64), NOPOS), NOPOS)
        closest = np.minimum.reduceat(mmp, offsets[:-1])
        closest[offsets[:-1] == offsets[1:]] = NOPOS  # empty segments
        at_closest = mm == closest[gi]
        counts = np.bincount(gi[at_closest], weights=occ[at_closest].astype(np.float64),
                             minlength=n_g).astype(np.int64)

        closest_l = closest.tolist()
        counts_l = counts.tolist()
        cols = self.header_columns()
        for i, g in enumerate(guides):
            hist = ",".join(str(c) for c in hists[i])
            if closest_l[i] == NOPOS:
                vals = ["UNK", "0", hist]
            else:
                vals = [str(closest_l[i]), str(counts_l[i]), hist]
            for col, v in zip(cols, vals):
                g.named_annotations[col] = [v]


class BedAnnotation(ScoreModel):
    """BED-interval overlap annotation + optional position remapping
    (BedAnnotation.scala:67-173)."""

    OLD_CONTIG_TAG = "oldContig"

    def __init__(self):
        self.input_bed = ""
        self.genome_transform = ""
        self.input_bed_files: List[str] = []
        self.input_bed_names: List[str] = []
        self.is_remapping = False
        self.mapping_intervals = None  # dict: contig -> (newContig, offset, stop, name)

    def score_name(self) -> str:
        return "BedAnnotator"

    def score_description(self) -> str:
        return "Annotated with overlaps to bed file " + ",".join(self.input_bed_files)

    def header_columns(self) -> List[str]:
        if self.is_remapping:
            return self.input_bed_names + [self.OLD_CONTIG_TAG]
        return list(self.input_bed_names)

    def valid_over_enzyme(self, pack) -> bool:
        return True

    def valid_over_target_sequence(self, pack, guide) -> bool:
        return True

    def setup(self) -> None:
        # BedAnnotation.scala:128-149
        if not self.input_bed:
            raise ValueError("If you request bed annotation you must provide a valid BED file")
        for bed_file in self.input_bed.split(","):
            assert ":" in bed_file, ("Bedfile command line argument " + bed_file +
                                     " doesn't contain both a name and a file")
            name, path = bed_file.split(":", 1)
            assert os.path.exists(path), "The input bed file doesn't exist: " + path
            self.input_bed_names.append(name)
            self.input_bed_files.append(path)
        if self.genome_transform:
            self._parse_interval(self.genome_transform)
            self.is_remapping = True

    def _parse_interval(self, interval_file: str) -> None:
        mapping = {}
        with open(interval_file) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split("\t")
                assert len(parts) == 4, "The interval didn't parse into a four part interval"
                mapping[parts[3]] = (parts[0], int(parts[1]), int(parts[2]), parts[3])
        self.mapping_intervals = mapping

    def score_guides(self, guides, bit_enc, pos_enc, pack) -> None:
        if self.mapping_intervals is not None:
            # the reference loops guides once per interval entry; contig
            # remapping is idempotent per guide because the contig changes
            # after the first remap (BedAnnotation.scala:69-90)
            for _ in self.mapping_intervals:
                for guide in guides:
                    ref = guide.contig
                    if ref in self.mapping_intervals:
                        new_pos = self.mapping_intervals[ref]
                        guide.contig = new_pos[0]
                        guide.start = guide.start + new_pos[1]
                        guide.named_annotations.setdefault(self.OLD_CONTIG_TAG, []).append(ref)

        for path, name in zip(self.input_bed_files, self.input_bed_names):
            for entry in iterate_bed(path):
                contig, start, stop, ename = entry[:4]
                for guide in guides:
                    if overlap(guide.contig, guide.start, len(guide.bases),
                               contig, start, stop):
                        guide.named_annotations.setdefault(name, []).append(ename)


def iterate_bed(path: str):
    """Minimal BED reader (utils/BedFileUtils.scala:27-76): tab-separated
    contig/start/stop/name, '#' comments skipped."""
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            yield parts[0], int(parts[1]), int(parts[2]), parts[3]


class ReciprocalOffTargets(ScoreModel):
    """Guide-vs-guide closeness flags (ReciprocalOffTargets.scala:54-62)."""

    def __init__(self):
        self.max_mismatch = 1

    def score_name(self) -> str:
        return "ReciprocalOffTargets"

    def score_description(self) -> str:
        return "Will guides within this design target one-anothers sites? "

    def header_columns(self) -> List[str]:
        return ["ReciprocalOffTargets"]

    def valid_over_enzyme(self, pack) -> bool:
        return True

    def valid_over_target_sequence(self, pack, guide) -> bool:
        return True

    def score_guides(self, guides, bit_enc, pos_enc, pack) -> None:
        for g1 in guides:
            for g2 in guides:
                mm = int(bit_enc.mismatches(g1.long_encoding, g2.long_encoding))
                if mm != 0 and mm <= self.max_mismatch:
                    g1.named_annotations.setdefault(self.score_name(), []).append(g2.bases)
