"""Super-P2G kernel tile sweep at 128^3 (same-process A/B).

Round 2 pinned (tx=1, ty=8); the VMEM budget argument gates tx, but ty
was never swept past 8 after the relayout-hoisting rewrite (the hoisted
family tensors scale with ty, the relayout COUNT does not — bigger ty
amortizes the 21 per-program relayouts over more output cells).
"""

import sys
import time

import jax

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.supertable import build_super_table
from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_accumulate_pallas_super


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    table = jax.jit(lambda p, v: build_super_table(cfg, p, v))(s.pos, s.vel)
    fetch(table.slots)

    tiles = [(1, 8), (1, 16), (1, 32), (2, 8), (2, 16), (4, 8)]
    results = {}
    for tx, ty in tiles:
        try:
            f = jax.jit(
                lambda t, tx=tx, ty=ty: p2g_accumulate_pallas_super(
                    cfg, t.slots, tx=tx, ty=ty
                )
            )
            out = f(table)
            fetch(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(table)
            fetch(out)
            ms = (time.perf_counter() - t0) / 5 * 1e3
            results[(tx, ty)] = ms
            print(f"tile ({tx},{ty}): {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"tile ({tx},{ty}): FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    if results:
        best = min(results, key=results.get)
        print(f"best: {best} at {results[best]:.2f} ms")


if __name__ == "__main__":
    main()
