"""Database dump to FASTA (the `extract` CLI module).

Counterpart of modules/DumpDatabase.scala and
reference/traverser/dump/DumpAllGuides.scala:61-130: walk every bin in order,
decode targets, filter by in-genome count [min, max], optionally subsample,
write ``>SEQ_count\\nSEQ`` records.
"""

from __future__ import annotations

import random

import numpy as np

from .database import load_database


def dump_database(args) -> None:
    db = load_database(args.database)
    enc = db.bit_encoding()
    rng = random.Random(args.seed) if args.seed is not None else random.Random()

    min_c = args.minInGenome
    max_c = args.maxInGenome
    prop = args.subsampleProportion

    seqs, counts = enc.decode_batch(db.targets)
    with open(args.outputFile, "w") as out:
        for s, c in zip(seqs, counts.tolist()):
            if min_c <= c <= max_c and rng.random() <= prop:
                out.write(">" + s + "_" + str(c) + "\n" + s + "\n")
