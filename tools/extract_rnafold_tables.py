"""Extract the ViennaRNA interior-loop tables shipped as reference resources.

The reference scores the `folding` metric through rnafold4j, a Java port of
ViennaRNA 1.8.x, and ships that library's 1x1 / 2x1 / 2x2 interior-loop
parameter tables (Turner 1999, 37C) as C-initializer text resources
(reference: src/main/resources/RNAFold_int{11,21,22}_37.txt; loaded by the
rnafold4j submodule, .gitmodules:1-3). This tool parses those public
ViennaRNA parameter dumps once into JSON consumed by
flashfry_tpu/scoring/rnafold.py. Enthalpy (_H) tables are skipped — we only
fold at 37C, like the reference CLI.

Run from the repo root:  python tools/extract_rnafold_tables.py
"""

import json
import os
import re

REF = "/root/reference/src/main/resources"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "flashfry_tpu", "scoring", "data", "rnafold_int.json")

# table -> nested dims: [pair][pair](+bases...) with pair axis 8 (NP,CG,GC,GU,UG,AU,UA,NN)
DIMS = {
    "RNAFold_int11_37.txt": (8, 8, 5, 5),
    "RNAFold_int21_37.txt": (8, 8, 5, 5, 5),
    "RNAFold_int22_37.txt": (8, 8, 5, 5, 5, 5),
}
INF = 10_000_000  # matches ViennaRNA's INF for never-taken entries


def parse_nested(text):
    """Parse a C-style nested brace initializer into nested Python lists."""
    tokens = re.findall(r"[{}]|-?\d+", text)
    pos = 0

    def parse():
        nonlocal pos
        assert tokens[pos] == "{", tokens[pos - 2:pos + 2]
        pos += 1
        out = []
        while tokens[pos] != "}":
            if tokens[pos] == "{":
                out.append(parse())
            else:
                out.append(int(tokens[pos]))
                pos += 1
        pos += 1
        return out

    return parse()


def conform(value, dims):
    """Apply C initializer semantics: missing trailing entries are 0; a
    scalar where an aggregate is expected fills the first slot."""
    if not dims:
        return value if isinstance(value, int) else conform(value[0] if value else 0, dims)
    if isinstance(value, int):
        value = [value]
    out = []
    for i in range(dims[0]):
        out.append(conform(value[i] if i < len(value) else 0, dims[1:]))
    return out


def main():
    tables = {}
    for fname, dims in DIMS.items():
        with open(os.path.join(REF, fname)) as fh:
            raw = parse_nested(fh.read())
        key = fname.split("_")[1]  # int11 / int21 / int22
        tables[key] = conform(raw, dims)
        flat = json.dumps(tables[key])
        n = len(re.findall(r"-?\d+", flat))
        expect = 1
        for d in dims:
            expect *= d
        assert n == expect, (fname, n, expect)
        print("%s: %s -> %d values" % (fname, dims, n))
    with open(OUT, "w") as fh:
        json.dump(tables, fh, separators=(",", ":"))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
