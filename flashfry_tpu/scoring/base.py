"""Scoring framework: model interface + single-guide adapter.

Counterpart of the reference's scoring/ScoreModel.scala (trait :31-89,
SingleGuideScoreModel :93-133). Scores are attached to guides as
named_annotations (lists of strings per column) and rendered by targetio.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from ..bitcoding import BitEncoding
from ..positions import BitPosition
from ..standards import ParameterPack
from ..targetio import GuideWithOffTargets

MISSING_ANNOTATION = "NA"


class ScoreModel:
    """Interface for all scoring metrics (ScoreModel.scala:31-89)."""

    #: None for unranked models; True/False = RankedScore.highScoreIsGood
    high_score_is_good: Optional[bool] = None
    #: True for models implementing the reference's AggregateScore trait
    is_aggregate: bool = False

    def score_name(self) -> str:
        raise NotImplementedError

    def score_description(self) -> str:
        raise NotImplementedError

    def header_columns(self) -> List[str]:
        raise NotImplementedError

    def score_guides(self, guides: Sequence[GuideWithOffTargets], bit_enc: BitEncoding,
                     pos_enc: BitPosition, pack: ParameterPack) -> None:
        raise NotImplementedError

    def valid_over_enzyme(self, pack: ParameterPack) -> bool:
        raise NotImplementedError

    def valid_over_target_sequence(self, pack: ParameterPack,
                                   guide: GuideWithOffTargets) -> bool:
        raise NotImplementedError

    def setup(self) -> None:
        pass

    def bit_encoder(self, bit_encoding: BitEncoding) -> None:
        pass

    def initialize_score_names(self, ranked_models) -> None:
        pass


class SingleGuideScoreModel(ScoreModel):
    """Adapter scoring one guide at a time (ScoreModel.scala:93-133)."""

    def score_guide(self, guide: GuideWithOffTargets) -> List[List[str]]:
        raise NotImplementedError

    def score_guides(self, guides, bit_enc, pos_enc, pack) -> None:
        for hit in guides:
            if self.valid_over_target_sequence(pack, hit):
                scores = self.score_guide(hit)
                cols = self.header_columns()
                assert len(scores) == len(cols)
                for col, vals in zip(cols, scores):
                    hit.named_annotations[col] = vals
            else:
                for col in self.header_columns():
                    hit.named_annotations[col] = [MISSING_ANNOTATION]


def find_guide_sequence_within_context(guide: GuideWithOffTargets) -> int:
    """Guide offset within its context (ScoreModel.scala:145-150)."""
    if guide.sequence_context is None:
        return -1
    return (len(guide.sequence_context) - len(guide.bases)) // 2
