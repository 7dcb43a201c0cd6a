"""Measure supercell-table overflow (particles beyond Ks slots, dropped
from P2G transfer) over a dam-break run.

PARITY.md item 8 claimed shipped scenarios have zero overflow — true for
the per-cell table at the configs round 1 shipped, but the round-2
supercell table (Ks = 4*ppc^3 + 4) pools density over 4 cells and the
128^3/ppc1 bench config compresses past it mid-collapse.  This records
the actual rate so the claim can be corrected with numbers.

Usage (TPU): python scripts/diag_overflow_rate.py [grid] [ppc] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ppc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    dt = jnp.float32(1 / 60)
    s = jax.device_put(init_state(cfg))
    n = s.pos.shape[0]
    print(f"backend {jax.default_backend()} grid {grid} ppc {ppc} "
          f"particles {n}", flush=True)

    from fluidsimulation_tpu.solver.step3d import use_super_table

    if use_super_table(cfg):
        from fluidsimulation_tpu.ops.supertable import build_super_table
        f_n = jax.jit(lambda p, v: build_super_table(cfg, p, v).n_overflow)
    else:
        from fluidsimulation_tpu.ops.celltable import build_cell_table
        f_n = jax.jit(lambda p, v: build_cell_table(cfg, p, v).n_overflow)

    worst = (0, 0)
    for k in range(steps):
        s = step_jit(s, dt, cfg)
        # Table the NEXT step will build: positions are post-advect.
        if k % 5 == 0 or k == steps - 1:
            no = int(f_n(s.pos, s.vel))
            worst = max(worst, (no, k))
            print(f"  step {k:3d}: n_overflow {no:8d}  ({100*no/n:.2f}%)",
                  flush=True)
    print(f"worst: {worst[0]} ({100*worst[0]/n:.2f}%) at step {worst[1]}",
          flush=True)


if __name__ == "__main__":
    main()
