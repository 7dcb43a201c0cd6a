"""Standalone timing of the supercell P2G Pallas kernel at 128^3."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.supertable import build_super_table, p2g_from_super
from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_from_super_pallas


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fetch(out)
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    table = jax.jit(lambda p, v: build_super_table(cfg, p, v))(s.pos, s.vel)
    fetch(table.slots)

    timeit("p2g_from_super_pallas (kernel + finish)",
           lambda t, p, v: p2g_from_super_pallas(cfg, t, p, v), table, s.pos, s.vel)
    from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_accumulate_pallas_super
    timeit("  accumulate kernel only",
           lambda t: p2g_accumulate_pallas_super(cfg, t.slots), table)
    timeit("p2g_from_super (XLA)",
           lambda t, p, v: p2g_from_super(cfg, t, p, v), table, s.pos, s.vel)


if __name__ == "__main__":
    main()
