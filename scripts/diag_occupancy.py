"""Per-cell occupancy through the dam break: what K makes the dense cell
table EXACT (zero overflow) at the headline configs?  (VERDICT r3 item 3.)

For each step prints max per-cell count and the particle overflow fraction
at candidate K tiers.  All stats computed on device, fetched in one gulp.

Usage (TPU): python scripts/diag_occupancy.py [ref64|bench|both] [steps]
"""

import sys

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.ops.common import cell_of

TIERS = (12, 16, 20, 24, 32, 48)


@functools.partial(jax.jit, static_argnames=("dims",))
def occupancy_stats(pos, dims):
    nx, ny, nz = dims
    pc = pos * jnp.array([nx, ny, nz], jnp.float32)
    cell = cell_of(pc)
    lin = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
    counts = jnp.zeros(nx * ny * nz, jnp.int32).at[lin].add(1, mode="drop")
    over = [jnp.maximum(counts - k, 0).sum() for k in TIERS]
    return jnp.stack([counts.max(), *over])


def run(tag, grid, ppc, steps, dt):
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    s = jax.device_put(init_state(cfg))
    n = s.pos.shape[0]
    stats = []
    for i in range(steps):
        s = step_jit(s, dt, cfg)
        stats.append(occupancy_stats(s.pos, (grid, grid, grid)))
    out = np.asarray(jnp.stack(stats))
    print(f"== {tag}: grid {grid}^3 ppc {ppc} N={n} {steps} steps ==",
          flush=True)
    hdr = "step maxcnt " + " ".join(f"ov@{k}" for k in TIERS)
    print(hdr)
    for i in range(0, steps, max(1, steps // 40)):
        row = out[i]
        print(f"{i + 1:4d} {row[0]:6d} "
              + " ".join(f"{v / n:7.4f}" for v in row[1:]), flush=True)
    pk = out[:, 0].argmax()
    print(f"peak maxcnt {out[pk, 0]} at step {pk + 1}; "
          f"worst overflow fractions: "
          + " ".join(f"K={k}:{out[:, 1 + j].max() / n:.4f}"
                     for j, k in enumerate(TIERS)), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ref64"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    print("backend", jax.default_backend(), flush=True)
    if which in ("ref64", "both"):
        run("ref64", 64, 2, steps, 0.5 / 60.0)
    if which in ("bench", "both"):
        run("bench", 128, 1, min(steps, 60), 1.0 / 60.0)


if __name__ == "__main__":
    main()
