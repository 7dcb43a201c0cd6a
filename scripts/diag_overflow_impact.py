"""Grid-level impact of table-overflow truncation: fast-path P2G (table,
Ks cap + 4096 corrections) vs the exact scatter path, at warm dam-break
states where overflow is at its measured peak.

Reports max / RMS difference of the normalized face velocities over
valid faces, and the fraction of valid faces that differ.

Usage (TPU): python scripts/diag_overflow_impact.py [grid] [ppc] [warm]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.p2g import transfer_to_grid
from fluidsimulation_tpu.solver.step3d import step_jit, use_super_table


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ppc = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 35
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    dt = jnp.float32(1 / 60)
    s = jax.device_put(init_state(cfg))
    for _ in range(warm):
        s = step_jit(s, dt, cfg)
    jax.device_get(s.vel.ravel()[0])
    print(f"backend {jax.default_backend()} grid {grid} ppc {ppc} "
          f"warm {warm}", flush=True)

    if use_super_table(cfg):
        from fluidsimulation_tpu.ops.supertable import (
            build_super_table, p2g_from_super)

        def fast(p, v):
            t = build_super_table(cfg, p, v)
            return (*p2g_from_super(cfg, t, p, v), t.n_overflow)
    else:
        from fluidsimulation_tpu.ops.celltable import (
            build_cell_table, p2g_from_table)

        def fast(p, v):
            t = build_cell_table(cfg, p, v)
            return (*p2g_from_table(cfg, t, p, v), t.n_overflow)

    uf, vf, wf, uvf, vvf, wvf, n_over = jax.jit(fast)(s.pos, s.vel)
    ue, ve, we, uve, vve, wve = jax.jit(
        lambda p, v: transfer_to_grid(cfg, p, v))(s.pos, s.vel)
    n = s.pos.shape[0]
    print(f"  n_overflow = {int(n_over)} ({100*int(n_over)/n:.2f}%)",
          flush=True)
    for name, (a, av, b, bv) in {
        "u": (uf, uvf, ue, uve), "v": (vf, vvf, ve, vve),
        "w": (wf, wvf, we, wve),
    }.items():
        both = (av > 0) & (bv > 0)
        d = jnp.abs(jnp.where(both, a - b, 0.0))
        nb = jnp.maximum(both.sum(), 1)
        rms = jnp.sqrt((d * d).sum() / nb)
        frac = ((d > 1e-6) & both).sum() / nb
        vm = jnp.abs(jnp.where(both, b, 0.0)).max()
        print(f"  {name}: valid-face max|Δ| {float(d.max()):.4f} "
              f"(|{name}|max {float(vm):.3f}), rms {float(rms):.5f}, "
              f"faces differing {100*float(frac):.2f}%  "
              f"validity-mask mismatch {int((av>0).sum()-(bv>0).sum())}",
              flush=True)


if __name__ == "__main__":
    main()
