"""Extract published scoring-model coefficient tables from the reference
sources into JSON data files.

These constants are the published model parameters of Doench 2014 (nbt.3026),
Doench 2016 CFD (nbt.3437), Moreno-Mateos 2015 (CRISPRscan), Jost & Santos
2019 (CRISPRi), and the crispr.mit.edu position coefficients — byte-exact
parity with the reference requires the identical numbers, so we extract them
mechanically rather than hand-transcribe (data, not code).

Run: python tools/extract_score_tables.py
"""

import json
import os
import re

REF = "/root/reference/src/main/scala/scoring"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "flashfry_tpu", "scoring", "data")


def read(name):
    with open(os.path.join(REF, name)) as fh:
        return fh.read()


def extract_doench2014():
    src = read("Doench2014OnTarget.scala")
    # scoreLookup entries: "KEY"-> value
    body = src.split("scoreLookup = collection.immutable.HashMap(")[1].split(")\n")[0]
    pairs = re.findall(r'"([ACGT]{1,2}\d+)"\s*->\s*(-?\d+\.\d+)', body)
    table = {k: float(v) for k, v in pairs}
    consts = {
        "gc_low": float(re.search(r"gc_low\s*=\s*(-?\d+\.\d+)", src).group(1)),
        "gc_high": float(re.search(r"gc_high\s*=\s*(-?\d+\.\d+)", src).group(1)),
        "intercept": float(re.search(r"intercept\s*=\s*(-?\d+\.\d+)", src).group(1)),
    }
    json.dump({"score_lookup": table, **consts},
              open(os.path.join(OUT, "doench2014.json"), "w"), indent=1, sort_keys=True)
    print("doench2014:", len(table), "entries")


def extract_cfd():
    src = read("Doench2016CFDScore.scala")
    mm_body = src.split("val mmLookup = Map(")[1].split("val pamLookup")[0]
    mm_pairs = re.findall(r'"(r[ACGU]:d[ACGT],\d+)"\s*->\s*(-?\d+(?:\.\d+)?)', mm_body)
    mm = {k: float(v) for k, v in mm_pairs}
    pam_body = src.split("val pamLookup = Map(")[1]
    pam_pairs = re.findall(r'"([ACGT]{2})"\s*->\s*(-?\d+(?:\.\d+)?)', pam_body)
    pam = {k: float(v) for k, v in pam_pairs}
    json.dump({"mm_lookup": mm, "pam_lookup": pam, "threshold": 0.023},
              open(os.path.join(OUT, "doench2016cfd.json"), "w"), indent=1, sort_keys=True)
    print("cfd:", len(mm), "mm entries,", len(pam), "pam entries")
    assert len(mm) == 12 * 19 + 12, len(mm)  # positions 1..20 minus missing? just report


def extract_crisprscan():
    src = read("CRISPRscan.scala")
    intercept = float(re.search(r"modelIntercept\s*=\s*(-?\d+\.\d+)", src).group(1))
    body = src.split("paramsCRISPRscan = Array[Tuple3[String, Int, Double]](")[1]
    entries = re.findall(r'\("([ACGT]{1,2})",(\d+),(-?\d+\.\d+)\)', body)
    params = [[s, int(p), float(w)] for s, p, w in entries]
    json.dump({"intercept": intercept, "params": params},
              open(os.path.join(OUT, "crisprscan.json"), "w"), indent=1)
    print("crisprscan:", len(params), "params")
    assert len(params) == 91, len(params)


def extract_jost():
    src = read("JostAndSantosCRISPRi.scala")
    entries = re.findall(
        r'CRISPRiEntry\((\d+),\s*"(r[ACGU]:d[ACGT])",\s*(-?\d+\.\d+(?:[eE]-?\d+)?),\s*(-?\d+\.\d+(?:[eE]-?\d+)?),\s*(\d+)\)', src)
    table = [[int(p), t, float(m), float(s), int(c)] for p, t, m, s, c in entries]
    json.dump({"entries": table},
              open(os.path.join(OUT, "jost_santos.json"), "w"), indent=1)
    print("jost:", len(table), "entries")
    assert len(table) == 228, len(table)


def extract_hsu():
    src = read("CrisprMitEduOffTarget.scala")
    body = src.split("offtargetCoeff = Array[Double](")[1].split(")")[0]
    coeffs = [float(x) for x in re.findall(r"(-?\d+\.?\d*)", body)]
    pam_body = src.split("pamToAdjustment = Map(")[1].split(")")[0]
    pam = {k: float(v) for k, v in re.findall(r'"([ACGT]{2})"\s*->\s*(-?\d+\.?\d*)', pam_body)}
    json.dump({"offtarget_coeff": coeffs, "pam_adjustment": pam, "default_pam_value": 0.01},
              open(os.path.join(OUT, "hsu2013.json"), "w"), indent=1, sort_keys=True)
    print("hsu:", len(coeffs), "coeffs,", len(pam), "pam entries")
    assert len(coeffs) == 20


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    extract_doench2014()
    extract_cfd()
    extract_crisprscan()
    extract_jost()
    extract_hsu()
