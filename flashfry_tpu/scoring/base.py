"""Scoring framework: model interface + single-guide adapter.

Counterpart of the reference's scoring/ScoreModel.scala (trait :31-89,
SingleGuideScoreModel :93-133). Scores are attached to guides as
named_annotations (lists of strings per column) and rendered by targetio.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..bitcoding import BitEncoding
from ..positions import BitPosition
from ..standards import ParameterPack
from ..targetio import GuideWithOffTargets

MISSING_ANNOTATION = "NA"


def flatten_guide_ots(guides: Sequence[GuideWithOffTargets]
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate many guides' columnar OT stores into one flat array.

    Returns (flat_longs uint64[N], offsets int64[G+1]) — guide i's OTs are
    flat_longs[offsets[i]:offsets[i+1]]. This is what lets the scoring models
    run their table gathers over ALL guides' off-targets at once instead of
    paying numpy fixed costs per guide (the reference loops guides one at a
    time, ScoreModel.scala:113-132; at 10^5 guides x few OTs each that
    per-call overhead dominates the actual math)."""
    arrs = [g.ot_arrays()[0] for g in guides]
    offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum(np.fromiter((a.shape[0] for a in arrs), np.int64, len(arrs)),
              out=offsets[1:])
    if not len(arrs) or not offsets[-1]:
        return np.zeros(0, np.uint64), offsets
    return np.concatenate(arrs).astype(np.uint64, copy=False), offsets


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
