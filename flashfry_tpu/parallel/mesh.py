"""Multi-chip sharded off-target scan.

The reference is a single-threaded JVM program (SURVEY.md §2 checklist); this
module supplies the missing scaling axes, TPU-native:

  * "db" mesh axis     — the genome target database (plane-major codes, see
                         ops/scan.py) is sharded across chips along the
                         target axis (contiguous global-scan-order slabs,
                         HBM-resident);
  * "guides" mesh axis — the guide batch is data-parallel;
  * per-target hit flags are merged with a max-reduce over the guide axis,
    comparison counters with a psum over both axes — XLA collectives over
    ICI, not hand-rolled communication.

Used by __graft_entry__.dryrun_multichip (virtual CPU mesh) and by the
multi-host discover path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def pick_devices(n: Optional[int] = None):
    """Prefer CPU devices for virtual meshes (tests/dryrun), else whatever
    the platform offers."""
    import jax
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    if n is not None:
        if len(devs) < n:
            devs = jax.devices()
        assert len(devs) >= n, "need %d devices, have %d" % (n, len(devs))
        devs = devs[:n]
    return devs


def make_mesh(n_devices: int):
    """2D (db, guides) mesh; guides axis gets a factor of 2 when possible."""
    import jax
    from jax.sharding import Mesh
    devs = pick_devices(n_devices)
    g_ax = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    db_ax = n_devices // g_ax
    arr = np.array(devs).reshape(db_ax, g_ax)
    return Mesh(arr, ("db", "guides"))


def make_sharded_scan_step(mesh, L: int, max_mm: int):
    """Build the jitted multi-chip discover step.

    Inputs (global shapes):
      codes       (32, N) int8  plane-major target codes, sharded over "db"
      guide_oh    (G, 4L) f32   guide one-hot, sharded over "guides"
      n_active    (G,)  f32     per-guide active-base count (127 for padding)

    Returns:
      hit_any     (N,) bool     sharded over "db", replicated over "guides"
      total_hits  ()   int32    fully reduced comparison/hit counter
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.scan import codes_onehot_jnp

    def local_step(codes, guide_oh, n_active):
        t_oh = codes_onehot_jnp(codes, L)                        # (4L, T_loc)
        matches = jax.lax.dot(guide_oh.astype(jnp.bfloat16), t_oh,
                              preferred_element_type=jnp.float32)  # (G_loc, T_loc)
        mm = n_active[:, None] - matches
        hit = mm <= max_mm
        hit_any_local = hit.any(axis=0)                          # (T_loc,)
        # merge over the guide (data-parallel) axis: logical OR == max
        hit_any = jax.lax.pmax(hit_any_local.astype(jnp.int32), "guides") > 0
        total = jax.lax.psum(jax.lax.psum(hit.sum().astype(jnp.int32), "guides"), "db")
        return hit_any, total

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(None, "db"), P("guides", None), P("guides")),
        out_specs=(P("db"), P()),
        check_vma=False,
    )
    return jax.jit(step)


def sharded_scan_demo(n_devices: int, targets_per_device: int = 1024,
                      guides_per_device: int = 8) -> Tuple[np.ndarray, int]:
    """One full sharded step on synthetic data; returns (hit_any, total)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..bitcoding import BitEncoding
    from ..ops.scan import guide_onehot_matrix, plane_codes
    from ..standards import Cas9NGGParameterPack

    mesh = make_mesh(n_devices)
    db_size = mesh.shape["db"]
    g_size = mesh.shape["guides"]
    pack = Cas9NGGParameterPack
    enc = BitEncoding(pack)
    L = pack.total_scan_length

    rng = np.random.default_rng(0)
    n = targets_per_device * db_size
    G = guides_per_device * g_size
    codes = rng.integers(0, 4, size=(n, L))
    seqs = ["".join("ACGT"[c] for c in row) for row in codes]
    target_longs = enc.encode_batch(seqs)
    guide_longs = target_longs[:G]  # guides drawn from targets: guaranteed hits

    code_planes = plane_codes(target_longs, L)
    guide_oh, n_active, _ = guide_onehot_matrix(guide_longs, pack, pad_to=G)
    guide_oh = guide_oh[:G]
    n_active = n_active[:G]

    step = make_sharded_scan_step(mesh, L, 4)
    codes_d = jax.device_put(code_planes, NamedSharding(mesh, P(None, "db")))
    goh_d = jax.device_put(guide_oh, NamedSharding(mesh, P("guides", None)))
    na_d = jax.device_put(n_active, NamedSharding(mesh, P("guides")))
    hit_any, total = step(codes_d, goh_d, na_d)
    return np.asarray(hit_any), int(total)
