"""Tab-delimited output/input — byte-compatible with the reference format.

Mirrors targetio/TabDelimitedHandler.scala: column layout (:38-91), row
rendering (:132-154) and the OT token grammar
``SEQ_count_mismatches<contig:pos^F|...>{score=val!...}`` (CRISPRHit.toOutput,
crispr/CRISPRHit.scala:54-88). The parser accepts our own output (and the
reference's), reconstructing guide + off-target state for the score module.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .bitcoding import BitEncoding
from .positions import BitPosition

HEADER_COMMENT = "# "
SEP = "\t"
FORWARD = "FWD"
REVERSE = "RVS"
OVERFLOW = "OVERFLOW"
TARGET_OK = "OK"
POSITION_FORWARD = "F"
POSITION_REVERSE = "R"
CONTIG_SEPARATOR = ":"
STRAND_SEPARATOR = "^"
OFF_TARGET_SEPARATOR = ","
WITHIN_OFF_TARGET_SEPARATOR = "_"
POSITION_LIST_FRONT = "<"
POSITION_LIST_BACK = ">"
POSITION_LIST_SEPARATOR = "|"
SCORES_FRONT = "{"
SCORES_BACK = "}"
SCORES_SEPARATOR = "!"
SCORES_PAIRING = "="

DEFAULT_COLUMNS = ["contig", "start", "stop", "target", "context", "overflow", "orientation"]
FINAL_COLUMNS = ["otCount", "offTargets"]
SET_COLUMN_COUNT = 8
MISSING_ANNOTATION = "NA"

_EXTRACT_POSITION_BLOCK = re.compile(r".*\<(.+?)\>.*")
_EXTRACT_SCORE_BLOCK = re.compile(r".*\{(.+?)\}.*")


@dataclass
class OffTargetHit:
    """One off-target sequence hit (crispr/CRISPRHit.scala)."""
    sequence: int                       # packed target long (count in high bits)
    coordinates: np.ndarray             # packed position longs
    valid_coordinates: bool = True
    scores: Optional[Dict[str, str]] = None

    @property
    def off_target_count(self) -> int:
        return int(self.coordinates.shape[0])

    def add_score(self, key: str, value: str) -> None:
        if self.scores is None:
            self.scores = {}
        assert key not in self.scores, "Scores already contains " + key
        self.scores[key] = value

    def to_output(self, bit_encoding: BitEncoding, pos_enc: BitPosition,
                  guide_long: int, output_positions: bool) -> str:
        seq_str, count = bit_encoding.decode(self.sequence)
        mm = int(bit_encoding.mismatches(guide_long, self.sequence))
        base = seq_str + WITHIN_OFF_TARGET_SEPARATOR + str(count) + \
            WITHIN_OFF_TARGET_SEPARATOR + str(mm)
        if not output_positions:
            return base
        if self.off_target_count == 0 or not self.valid_coordinates:
            ret = base
        else:
            parts = []
            for p in self.coordinates:
                contig_id, start, _, fwd = BitPosition.decode_batch(np.array([p], dtype=np.uint64))
                name = pos_enc.index_to_contig[int(contig_id[0])]
                parts.append(name + CONTIG_SEPARATOR + str(int(start[0])) + STRAND_SEPARATOR +
                             (POSITION_FORWARD if bool(fwd[0]) else POSITION_REVERSE))
            ret = base + POSITION_LIST_FRONT + POSITION_LIST_SEPARATOR.join(parts) + POSITION_LIST_BACK
        if self.scores:
            ret += SCORES_FRONT + SCORES_SEPARATOR.join(
                k + SCORES_PAIRING + v for k, v in self.scores.items()) + SCORES_BACK
        return ret


@dataclass
class GuideWithOffTargets:
    """A candidate guide plus its collected off-targets
    (crispr/CRISPRSiteOT.scala)."""
    contig: str
    start: int
    bases: str
    forward_strand: bool
    sequence_context: Optional[str]
    long_encoding: int
    off_targets: List[OffTargetHit] = field(default_factory=list)
    overflow_cap: int = 2000
    current_total: int = 0
    inherited_overflow: bool = False
    named_annotations: Dict[str, List[str]] = field(default_factory=dict)

    @property
    def full(self) -> bool:
        return self.overflow_cap > 0 and self.current_total >= self.overflow_cap

    def add_ot(self, hit: OffTargetHit) -> None:
        """CRISPRSiteOT.addOT (:41-46): count the hit's positions."""
        self.off_targets.append(hit)
        self.current_total += hit.off_target_count

    @property
    def stop(self) -> int:
        return self.start + len(self.bases)

    def ot_count_total(self) -> int:
        return sum(ot.off_target_count for ot in self.off_targets)


def write_header(models: Sequence, write_ots: bool) -> str:
    cols = list(DEFAULT_COLUMNS)
    for m in models:
        cols.extend(m.header_columns())
    if write_ots:
        return SEP.join(cols) + SEP + SEP.join(FINAL_COLUMNS) + "\n"
    return SEP.join(cols) + SEP + FINAL_COLUMNS[0] + "\n"


def write_guide_line(guide: GuideWithOffTargets, bit_encoding: BitEncoding,
                     pos_enc: BitPosition, models: Sequence,
                     write_ots: bool, write_positions: bool) -> str:
    """One output row (TabDelimitedHandler.scala:132-154)."""
    out = []
    out.append(guide.contig + SEP)
    out.append(str(guide.start) + SEP)
    out.append(str(guide.stop) + SEP)
    out.append(guide.bases + SEP)
    out.append((guide.sequence_context if guide.sequence_context is not None else "NONE") + SEP)
    out.append((OVERFLOW if (guide.full or guide.inherited_overflow) else TARGET_OK) + SEP)
    out.append((FORWARD if guide.forward_strand else REVERSE) + SEP)
    for model in models:
        vals = [",".join(guide.named_annotations.get(col, [MISSING_ANNOTATION]))
                for col in model.header_columns()]
        out.append(SEP.join(vals) + SEP)
    out.append(str(guide.ot_count_total()))
    if write_ots:
        tokens = OFF_TARGET_SEPARATOR.join(
            ot.to_output(bit_encoding, pos_enc, guide.long_encoding, write_positions)
            for ot in guide.off_targets)
        out.append(SEP + tokens + "\n")
    else:
        out.append("\n")
    return "".join(out)


def write_output(path: str, guides: Sequence[GuideWithOffTargets],
                 bit_encoding: BitEncoding, pos_enc: BitPosition,
                 models: Sequence = (), write_ots: bool = True,
                 write_positions: bool = False) -> None:
    import gzip
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as fh:
        fh.write(write_header(models, write_ots))
        for g in guides:
            fh.write(write_guide_line(g, bit_encoding, pos_enc, models, write_ots, write_positions))


# ---------------------------------------------------------------------------
# parsing (TabDelimitedInput, TabDelimitedHandler.scala:169-334)
# ---------------------------------------------------------------------------

@dataclass
class ParsedInput:
    guides: List[GuideWithOffTargets]
    annotations: List[str]
    with_ots: bool


def parse_input(path: str, bit_encoding: BitEncoding, pos_enc: BitPosition,
                maximum_mismatches: int,
                filter_out_overflowed: bool = False) -> ParsedInput:
    from .utils import open_maybe_gzip
    with open_maybe_gzip(path) as fh:
        lines = fh.read().split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    header = lines[0].split(SEP)
    assert len(header) > len(DEFAULT_COLUMNS) + len(FINAL_COLUMNS) - 1, \
        "Header line not long enough for file: " + path
    assert header[:len(DEFAULT_COLUMNS)] == DEFAULT_COLUMNS, \
        "Mismatched line doesn't contain the standard header tokens: " + path

    remaining = header[len(DEFAULT_COLUMNS):]
    with_ots = len(remaining) >= 2 and remaining[-2] == FINAL_COLUMNS[0] and remaining[-1] == FINAL_COLUMNS[1]
    assert with_ots or remaining[-1] == FINAL_COLUMNS[0], "Unable to parse out the final columns"
    annotations = remaining[:-2] if with_ots else remaining[:-1]
    token_length = len(header)

    guides: List[GuideWithOffTargets] = []
    for ln in lines[1:]:
        g = _extract_guide(ln, annotations, bit_encoding, pos_enc, with_ots,
                           token_length, maximum_mismatches)
        if g is not None and (not filter_out_overflowed or
                              (not g.inherited_overflow and not g.full)):
            guides.append(g)
    return ParsedInput(guides, annotations, with_ots)


def _extract_guide(ln: str, annotations: List[str], bit_encoding: BitEncoding,
                   pos_enc: BitPosition, with_ots: bool, token_length: int,
                   maximum_mismatches: int) -> Optional[GuideWithOffTargets]:
    sp = ln.split(SEP)
    contig, start, _stop, target, context, overflow_col, orientation = sp[:7]
    is_overflowed = overflow_col != TARGET_OK
    # overflowCount reconstruction (TabDelimitedHandler.scala:242-247)
    ot_count_col = int(sp[(SET_COLUMN_COUNT - 1) + len(annotations)])
    overflow_cap = ot_count_col + (0 if is_overflowed else 1)

    guide = GuideWithOffTargets(
        contig=contig,
        start=int(start),
        bases=target,
        forward_strand=orientation == FORWARD,
        sequence_context=None if context == "NONE" else context,
        long_encoding=bit_encoding.encode(target),
        overflow_cap=overflow_cap,
        inherited_overflow=is_overflowed,
    )
    for i, a in enumerate(annotations):
        guide.named_annotations[a] = [sp[7 + i]]

    if with_ots and len(sp) == token_length and sp[-1]:
        for token in sp[-1].split(OFF_TARGET_SEPARATOR):
            _add_off_target(guide, token, maximum_mismatches, pos_enc, bit_encoding)
    return guide


def _add_off_target(guide: GuideWithOffTargets, token: str, maximum_mismatches: int,
                    pos_enc: BitPosition, bit_encoding: BitEncoding) -> None:
    """TabDelimitedHandler.scala:278-334."""
    pieces = token.split(WITHIN_OFF_TARGET_SEPARATOR)
    seq = pieces[0]
    count = int(pieces[1])
    if POSITION_LIST_FRONT in pieces[2]:
        mismatches = int(pieces[2].split(POSITION_LIST_FRONT)[0])
    else:
        mismatches = int(pieces[2])

    hit: Optional[OffTargetHit] = None
    if mismatches <= maximum_mismatches:
        if POSITION_LIST_FRONT in token:
            block = _EXTRACT_POSITION_BLOCK.match(token).group(1)
            coords = []
            for pe in block.split(POSITION_LIST_SEPARATOR):
                cname, rest = pe.split(CONTIG_SEPARATOR, 1)
                pos_str, strand = rest.split(STRAND_SEPARATOR)
                coords.append(pos_enc.encode(cname, int(pos_str), len(seq), strand == POSITION_FORWARD))
            assert count <= 32767, "The count was too large to encode"
            hit = OffTargetHit(bit_encoding.encode(seq, count),
                               np.array(coords, dtype=np.uint64), True)
        else:
            assert count <= 32767, "The count was too large to encode"
            hit = OffTargetHit(bit_encoding.encode(seq, count),
                               np.zeros(count, dtype=np.uint64), False)
        if not guide.full:
            guide.add_ot(hit)

    if SCORES_FRONT in token:
        assert hit is not None, "We currently require positional information to define off-target scores"
        block = _EXTRACT_SCORE_BLOCK.match(token).group(1)
        for pair in block.split(SCORES_SEPARATOR):
            k, v = pair.split(SCORES_PAIRING)
            hit.add_score(k, v)
