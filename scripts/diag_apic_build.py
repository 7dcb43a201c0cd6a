"""APIC table-build anatomy + the 16-lane payload-gather fix (round 4).

CLAUDE.md's width model: 8-lane rows gather at ~7-11 ns, 16-40 lanes are
TERRIBLE (24-64 ns), >=64 lanes ~12-16 ns.  build_apic_table's payload
permute is a (N, 16)[perm] gather — squarely in the terrible band.
Candidates measured here (same process):

  A. (N,16)[perm]                      — current
  B. two (N,8)[perm] + concat          — two fast-width transactions
  C. (N,64) zero-padded [perm]         — pay 4x bytes at the fast rate

plus the full build_apic_table before/after wiring in the winner.

Usage (TPU): python scripts/diag_apic_build.py
"""

import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.solver.apic import init_apic_state, step_apic_jit
from fluidsimulation_tpu.solver.step3d import clamp_dt


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def timeit(name, f, *args, n=5, rounds=2):
    f = jax.jit(f)
    out = f(*args)
    fetch(out if isinstance(out, jax.Array) else out[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        fetch(out if isinstance(out, jax.Array) else out[0])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:46s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 953_312
    pay = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    timeit("A (N,16)[perm]", lambda p, q: p[q], pay, perm)
    timeit(
        "B 2x (N,8)[perm] + concat",
        lambda p, q: jnp.concatenate([p[:, :8][q], p[:, 8:][q]], axis=1),
        pay, perm,
    )
    timeit(
        "C (N,64) padded [perm]",
        lambda p, q: jnp.pad(p, ((0, 0), (0, 48)))[q][:, :16],
        pay, perm,
    )

    # Full build on a realistic warm state.
    cfg = SimConfig(nx=64, ny=64, nz=64, cells_per_meter=64.0,
                    particles_per_cell_axis=2)
    dt = clamp_dt(cfg, 1 / 60, simulation_rate=0.5)
    s = jax.device_put(init_apic_state(cfg))
    for _ in range(5):
        s = step_apic_jit(s, dt, cfg)
    fetch(s.pos)

    from fluidsimulation_tpu.ops.apic import build_apic_table

    timeit(
        "build_apic_table (current)",
        lambda p, v, c: build_apic_table(cfg, p, v, c).slots,
        s.pos, s.vel, s.C,
    )


if __name__ == "__main__":
    main()
