"""Round-5 256^3 measurement: the z-blocked super-P2G kernel (first Pallas
P2G at this scale) vs the XLA supercell fallback, plus clean fused-step
timing (steps timed INDIVIDUALLY, first post-compile execution dropped —
docs/PERF.md round 4 measurement discipline).

Usage (TPU, solo): python scripts/diag_r5_256.py [n]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = SimConfig(nx=n, ny=n, nz=n, cells_per_meter=float(n),
                    particles_per_cell_axis=1)
    print("backend", jax.default_backend(), "grid", n,
          "particles", cfg.num_particles, flush=True)
    s = jax.device_put(init_state(cfg))

    # Standalone kernel A/B on a real mid-collapse table.
    for _ in range(3):
        s = step_jit(s, 1.0 / 60.0, cfg)
    fetch(s.vel)
    from fluidsimulation_tpu.ops import supertable as st
    from fluidsimulation_tpu.ops.pallas_p2g_super import (
        p2g_from_super_pallas,
        super_p2g_fits,
    )

    print("super_p2g_fits:", super_p2g_fits(cfg), flush=True)
    table = jax.jit(
        lambda p, v: st.build_super_table(cfg, p, v)
    )(s.pos, s.vel)
    fetch(table.slots)

    xla_fn = jax.jit(lambda t: st.p2g_from_super(cfg, t, None, None)[0])
    pal_fn = jax.jit(lambda t: p2g_from_super_pallas(cfg, t, None, None)[0])

    def timeit(name, f, *a):
        try:
            out = f(*a)
            fetch(out)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*a)
            fetch(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3:.1f} ms", flush=True)
        return out

    u_x = timeit("XLA supercell P2G (u only)", xla_fn, table)
    u_p = timeit("Pallas z-blocked P2G (u only)", pal_fn, table)
    if u_x is not None and u_p is not None:
        d = float(jnp.max(jnp.abs(u_x - u_p)))
        print(f"max |u_xla - u_pallas| = {d:.3e}", flush=True)

    # Clean fused-step timing, steps timed individually.
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        s = step_jit(s, 1.0 / 60.0, cfg)
        fetch(s.vel)
        times.append(time.perf_counter() - t0)
    print("per-step s:", [round(t, 2) for t in times], flush=True)
    steady = sorted(times[1:])[: len(times) // 2]
    print(f"steady median-ish: {np.median(times[1:]):.2f} s "
          f"(best {min(times[1:]):.2f})", flush=True)


if __name__ == "__main__":
    main()
