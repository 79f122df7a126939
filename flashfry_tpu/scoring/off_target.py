"""Off-target activity models: Doench 2016 CFD, Hsu 2013 (crispr.mit.edu),
Jost & Santos CRISPRi.

Counterparts of scoring/Doench2016CFDScore.scala,
scoring/CrisprMitEduOffTarget.scala and scoring/JostAndSantosCRISPRi.scala.
Coefficient tables are the published model parameters, extracted to JSON in
scoring/data/.
"""

from __future__ import annotations

import json
import os
from typing import List

from ..javafmt import java_double_to_string
from ..standards import (CAS9_SCAN_LENGTH_19MER, CAS9_SCAN_LENGTH_20MER,
                         ParameterPack)
from ..utils import comp_base
from .base import SingleGuideScoreModel

_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _load(name):
    with open(os.path.join(_DATA, name)) as fh:
        return json.load(fh)


class Doench2016CFDScore(SingleGuideScoreModel):
    """CFD max-OT + specificity score (Doench2016CFDScore.scala:53-88,
    mismatch/pam tables :173-214)."""

    high_score_is_good = False

    def __init__(self):
        d = _load("doench2016cfd.json")
        self._mm = d["mm_lookup"]
        self._pam = d["pam_lookup"]
        self._threshold = d["threshold"]
        self._enc = None

    def score_name(self) -> str:
        return "Doench2016CFDScore"

    def score_description(self) -> str:
        return ("Score off-target effects from Doench 'Optimized sgRNA design to maximize "
                "activity and minimize off-target effects of CRISPR-Cas9'")

    def header_columns(self) -> List[str]:
        return ["DoenchCFD_maxOT", "DoenchCFD_specificityscore"]

    def valid_over_enzyme(self, pack: ParameterPack) -> bool:
        return pack.enzyme_family == "cas9" and pack.total_scan_length == CAS9_SCAN_LENGTH_20MER

    def valid_over_target_sequence(self, pack, guide) -> bool:
        return pack.total_scan_length == 23 and pack.enzyme_family == "cas9"

    def bit_encoder(self, bit_encoding) -> None:
        self._enc = bit_encoding

    def score_guide(self, guide) -> List[List[str]]:
        assert len(guide.bases) == 23, "We saw an unexpected guide size of %d" % len(guide.bases)
        assert self._enc is not None, "Our bitEncoder has not been set"
        bases = guide.bases
        scores = []
        for ot in guide.off_targets:
            ot_seq, ot_count = self._enc.decode(ot.sequence)
            # exclude exact-guide-sequence hits (Doench2016CFDScore.scala:67)
            if ot_seq[:20] != bases[:20]:
                pam = self._pam[ot_seq[-2:]]
                candidate = self.score_cfd(bases[:20], ot_seq[:20])
                ot.add_score(self.score_name(), java_double_to_string(pam * candidate))
                scores.append((pam * candidate, ot_count))
        if scores:
            specificity = 1.0 / (1.0 + sum(s * c for s, c in scores))
            max_score = max(s for s, _ in scores)
        else:
            specificity = 1.0
            max_score = 0.0
        # CRISPOR-guided threshold at 0.023 (Doench2016CFDScore.scala:83)
        max_out = java_double_to_string(max_score) if max_score >= self._threshold else "0.0"
        return [[max_out], [java_double_to_string(specificity)]]

    def score_cfd(self, guide: str, ot_string: str) -> float:
        """Doench2016CFDScore.scala:132-151."""
        assert len(guide) == 20 and len(ot_string) == 20
        g = guide.upper().replace("T", "U")
        o = ot_string.upper().replace("T", "U")
        score = 1.0
        for index, (gb, ob) in enumerate(zip(g, o)):
            if gb != ob:
                key = "r%s:d%s,%d" % (gb, _special_rev_comp(ob), index + 1)
                assert key in self._mm, "Missing key " + key
                score *= self._mm[key]
        return score


def _special_rev_comp(c: str) -> str:
    if c == "A":
        return "T"
    if c == "C":
        return "G"
    if c == "G":
        return "C"
    if c == "U":
        return "A"
    return c


class CrisprMitEduOffTarget(SingleGuideScoreModel):
    """Hsu 2013 / crispr.mit.edu aggregate score
    (CrisprMitEduOffTarget.scala:73-148)."""

    high_score_is_good = True

    GUIDE_SIZE = 20
    PAM_START = 21
    PAM_STOP = 23

    def __init__(self):
        d = _load("hsu2013.json")
        self._coeff = d["offtarget_coeff"]
        self._pam_adj = d["pam_adjustment"]
        self._default_pam = d["default_pam_value"]
        self.consider_on_target = False
        self._enc = None

    def score_name(self) -> str:
        return "Hsu2013"

    def score_description(self) -> str:
        return "The scoring scheme from crispr.mit.edu"

    def header_columns(self) -> List[str]:
        return [self.score_name()]

    def valid_over_enzyme(self, pack: ParameterPack) -> bool:
        return pack.enzyme_family == "cas9" and pack.total_scan_length == CAS9_SCAN_LENGTH_20MER

    def valid_over_target_sequence(self, pack, guide) -> bool:
        return self.valid_over_enzyme(pack)

    def bit_encoder(self, bit_encoding) -> None:
        self._enc = bit_encoding

    def score_guide(self, guide) -> List[List[str]]:
        return [[java_double_to_string(self.score_crispr(guide))]]

    def score_crispr(self, guide) -> float:
        assert self._enc is not None, "We don't have a valid bit encoding to work with"
        scores = []
        for ot in guide.off_targets:
            if self.consider_on_target or int(self._enc.mismatches(guide.long_encoding, ot.sequence)) != 0:
                scores.append(self.score_off_target(guide, ot))
        return (100.0 / (100.0 + sum(scores))) * 100.0

    def score_off_target(self, guide, ot) -> float:
        """CrisprMitEduOffTarget.scala:107-148."""
        ot_seq, _ = self._enc.decode(ot.sequence)
        mismatches = 0
        distances = []
        last_mismatch = None
        part_one = 1.0
        for index, (ob, gb) in enumerate(zip(ot_seq[:self.GUIDE_SIZE],
                                             guide.bases[:self.GUIDE_SIZE])):
            if ob != gb:
                part_one *= 1.0 - self._coeff[index]
                mismatches += 1
                if last_mismatch is not None:
                    distances.append(index - last_mismatch)
                last_mismatch = index
        if mismatches < 2:
            part_two = 1.0
        else:
            avg_dist = sum(distances) / float(len(distances))
            part_two = 1.0 / ((((19.0 - avg_dist) / 19.0) * 4.0) + 1.0)
        part_three = 1.0 if mismatches == 0 else 1.0 / float(mismatches) ** 2
        total = part_one * part_two * part_three * 100.0
        pam = ot_seq[self.PAM_START:self.PAM_STOP]
        return total * self._pam_adj.get(pam, self._default_pam)


class JostAndSantosCRISPRi(SingleGuideScoreModel):
    """Jost & Santos 2019 CRISPRi mismatch-activity model
    (JostAndSantosCRISPRi.scala:27-127, table :152-380)."""

    high_score_is_good = True

    def __init__(self):
        d = _load("jost_santos.json")
        # key: (position, OT base (RNA->DNA), comp(guide base)) -> mean
        self._mean = {}
        for pos, trans, mean, _std, _count in d["entries"]:
            base_from = "T" if trans[1] == "U" else trans[1]
            base_to = "T" if trans[4] == "U" else trans[4]
            self._mean[(int(pos), base_from, base_to)] = float(mean)
        self._enc = None
        self._pack = None

    def score_name(self) -> str:
        return "JostAndSantosCRISPRi"

    def score_description(self) -> str:
        return "CRISPRi score developed by Jost and Santos (BioRxiv, 2019)"

    def header_columns(self) -> List[str]:
        return ["JostCRISPRi_maxOT", "JostCRISPRi_specificityscore"]

    def valid_over_enzyme(self, pack: ParameterPack) -> bool:
        self._pack = pack
        return pack.enzyme_family == "cas9" and pack.total_scan_length in (
            CAS9_SCAN_LENGTH_20MER, CAS9_SCAN_LENGTH_19MER)

    def valid_over_target_sequence(self, pack, guide) -> bool:
        return pack.enzyme_family == "cas9"

    def bit_encoder(self, bit_encoding) -> None:
        self._enc = bit_encoding
        if self._pack is None:
            self._pack = bit_encoding.pack

    def score_guide(self, guide) -> List[List[str]]:
        sequence, _ = self._enc.decode(guide.long_encoding)
        scores = []
        for ot in guide.off_targets:
            base_diff = int(self._enc.mismatches(ot.sequence, guide.long_encoding))
            if base_diff > 0:
                ot_seq, _ = self._enc.decode(ot.sequence)
                scores.append((self.calc_score(sequence, ot_seq), ot.off_target_count))
        specificity = 1.0 / (1.0 + sum(s * c for s, c in scores))
        max_score = 0.0 if not scores else max(s for s, _ in scores)
        return [[java_double_to_string(max_score)],
                [java_double_to_string(specificity)]]

    def calc_score(self, target: str, off_target: str) -> float:
        """JostAndSantosCRISPRi.scala:92-127. For 20-mers, positions 1..19 of
        the sequence; for 19-mers, positions 0..18 (both keyed 1..19)."""
        L = self._pack.total_scan_length
        assert len(target) == L and len(off_target) == L
        total = 1.0
        if L == CAS9_SCAN_LENGTH_20MER:
            lo = 1
        elif L == CAS9_SCAN_LENGTH_19MER:
            lo = 0
        else:
            raise ValueError("Unable to match parameter pack")
        for i in range(lo, lo + 19):
            base = off_target[i]
            if target[i] != base:
                key = (i - lo + 1, base, comp_base(target[i]))
                total *= self._mean[key]
        return total
