"""Diagnose the halo-APIC vs single-device mismatch (CPU 8-device mesh).

Runs 1 and 2 steps, compares every state field, and localizes mismatching
particles in x (shard boundaries at multiples of nx/D cells).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.parallel.halo_apic import (
    make_halo_apic_step,
    shard_apic_state_x,
)
from fluidsimulation_tpu.parallel.sharding import make_mesh
from fluidsimulation_tpu.solver.apic import init_apic_state, step_apic_jit


def cmp(tag, a, b, pos=None, nx=32, D=8):
    a, b = np.asarray(a), np.asarray(b)
    d = np.abs(a - b)
    print(f"{tag:8s} max {d.max():.3e} mean {d.mean():.3e} "
          f"n>1e-6 {(d > 1e-6).sum()}")
    if pos is not None and d.max() > 1e-6:
        bad = (d.reshape(len(pos), -1).max(1) > 1e-6)
        x = np.asarray(pos)[:, 0] * nx  # cell units
        xs = x[bad]
        # distance to nearest shard boundary (multiples of nx/D)
        db = np.abs(((xs + nx / D / 2) % (nx / D)) - nx / D / 2)
        print(f"    bad particles: {bad.sum()}  x-cell range "
              f"[{xs.min():.2f}, {xs.max():.2f}]  "
              f"dist-to-boundary: min {db.min():.2f} "
              f"p50 {np.percentile(db, 50):.2f} max {db.max():.2f}")
        hist, _ = np.histogram(xs, bins=np.arange(0, nx + 1, 2))
        print(f"    x-cell hist (bin=2): {hist.tolist()}")


def main():
    cfg = SimConfig(nx=32, ny=32, nz=32, cells_per_meter=32.0)
    mesh = make_mesh(jax.devices()[:8])
    halo_step = make_halo_apic_step(cfg, mesh)

    want = init_apic_state(cfg)
    got = shard_apic_state_x(init_apic_state(cfg), mesh)

    for it in range(1, 3):
        want = step_apic_jit(want, 0.01, cfg)
        got = halo_step(got, 0.01)
        print(f"--- after step {it} ---")
        cmp("pos", got.pos, want.pos, pos=want.pos)
        cmp("vel", got.vel, want.vel, pos=want.pos)
        cmp("C", got.C, want.C, pos=want.pos)
        for f in ("u", "v", "w", "phi"):
            cmp(f, getattr(got, f), getattr(want, f))


if __name__ == "__main__":
    main()
