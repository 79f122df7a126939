"""Measure the 2-host scaling model's inputs and print the derived
efficiency (BASELINE.md:40 asks >=80% to 2 hosts; real 2-host hardware is
unavailable here, so the deliverable is a measured traffic/compute model —
VERDICT r4 #5).

Measured inputs:
  * DCN bytes allgathered per guide block — from an actual 2-process
    jax.distributed run on virtual CPU devices (the triplet-buffer slices
    are the ONLY cross-host traffic in the db-axis design; their size
    depends on hit counts and bucket rounding, not on device type);
  * per-block scan seconds on the real chip — pass via --block-seconds
    (e.g. the bench's seconds_per_scan for a 1024-guide block at hg38
    scale), else the round-5 measured 0.55 s is used.

Model: each host owns half the db axis, so per-host scan time halves;
the DCN cost per block is bytes/bandwidth + latency. Efficiency at 2
hosts = T1 / (2 * (T1/2 + t_dcn)).
"""
import argparse
import os
import re
import socket
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def measure_dcn_bytes(n_bases=2_000_000, n_guides=1024, max_mm=4):
    """2-process virtual-CPU scan of a synthetic db; returns
    (bytes, allgather_calls, hit_rows, n_blocks)."""
    from flashfry_tpu.database import build_database_from_sites, save_database
    from flashfry_tpu.discovery import find_target_sites
    from flashfry_tpu.standards import Cas9NGGParameterPack

    tmp = tempfile.mkdtemp(prefix="mh_model_")
    rng = np.random.default_rng(41)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=n_bases))
    sites = find_target_sites(iter([("chrM", genome)]), Cas9NGGParameterPack)
    db = build_database_from_sites(sites, 7)
    db_path = os.path.join(tmp, "db.npz")
    save_database(db, db_path)
    guides = db.targets[rng.choice(db.num_targets, size=n_guides,
                                   replace=False)]
    guides_path = os.path.join(tmp, "guides.npz")
    np.savez(guides_path, guides=guides)

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["FLASHFRY_TPU_DCN_LOG"] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    port = free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "flashfry_tpu.parallel.multihost",
             "--coordinator", "localhost:%d" % port,
             "--numProcesses", "2", "--processId", str(pid),
             "--database", db_path, "--guides", guides_path,
             "--maxMismatch", str(max_mm)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]
    m = re.search(rb"DCN_ALLGATHER bytes=(\d+) calls=(\d+) hits=(\d+)",
                  outs[0][0])
    assert m, outs[0][0][-2000:]
    n_blocks = max(1, -(-n_guides // 1024))
    return (int(m.group(1)), int(m.group(2)), int(m.group(3)), n_blocks,
            db.num_targets)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-seconds", type=float, default=0.55,
                    help="measured per-1024-guide-block full-db scan "
                         "seconds on the real chip (round-5: 0.55)")
    ap.add_argument("--dcn-gbps", type=float, default=50.0,
                    help="assumed DCN bandwidth per host, Gbit/s "
                         "(v5e hosts: 100 GbE class; 50 is conservative)")
    ap.add_argument("--dcn-latency-ms", type=float, default=1.0)
    a = ap.parse_args()

    print("measuring DCN bytes in a real 2-process run (virtual CPU mesh)...",
          flush=True)
    bytes_, calls, hits, n_blocks, n_targets = measure_dcn_bytes()
    per_block = bytes_ / n_blocks
    print("2-process run: %d targets, %d hit rows, %d allgather calls, "
          "%d bytes total -> %.2f MB per 1024-guide block"
          % (n_targets, hits, calls, bytes_, per_block / 1e6))

    # conservative hg38-scale upper bound: the body slice is bucketed to
    # 64k-triplet multiples and capped by the settled library trip cap
    trip_cap = 524288
    worst_block = 2 * 1 * 2 * trip_cap * 4   # D x Gx x rows x cap x int32
    bw = a.dcn_gbps * 1e9 / 8
    for label, b in (("measured", per_block), ("trip-cap bound", worst_block)):
        t_dcn = b / bw + a.dcn_latency_ms / 1e3 * 2  # header + body slices
        t1 = a.block_seconds
        eff = t1 / (2 * (t1 / 2 + t_dcn))
        print("%-16s %8.2f MB/block -> t_dcn %.1f ms vs t_scan/2 %.0f ms "
              "-> 2-host efficiency %.1f%%"
              % (label, b / 1e6, t_dcn * 1e3, t1 / 2 * 1e3, eff * 100))


if __name__ == "__main__":
    main()
