"""Pallas in-VMEM SOR at 64^3 with the raised scoped-VMEM cap: does it
compile through the axon remote helper, is it equal to the XLA form, and
what does it buy (kernel-level and fused-step A/B)?

Round-1 gate was 48^3 under the default 16 MiB limit; round 4's sweep
kernels proved the limit raisable, admitting 64^3 (~24 MiB stack+arrays).

Usage (TPU): python scripts/diag_sor64.py [grid]
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
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.ops import project
from fluidsimulation_tpu.ops.pallas_sor import sor_pressure_pallas


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def timeit(name, f, *args, n=5, rounds=3):
    out = f(*args)
    fetch(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:32s} {best * 1e3:8.2f} ms", flush=True)
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=2 if grid <= 64 else 1)
    dt = jnp.float32(1 / 120)
    s = jax.device_put(init_state(cfg))
    for _ in range(8):
        s = step_jit(s, dt, cfg)
    fetch(s.vel)
    print(f"backend {jax.default_backend()} grid {grid}^3", flush=True)

    # Real solve inputs from the stepped state.
    rhs = jax.jit(lambda u, v, w: project.compute_rhs(cfg, u, v, w, dt))(
        s.u, s.v, s.w)
    diag = jax.jit(lambda phi: project.compute_diag(cfg, phi))(s.phi)
    fetch(rhs)

    xla = jax.jit(lambda phi, d, b: project.sor_pressure(
        cfg, phi, d, b, use_pallas=False))
    pls = jax.jit(lambda phi, d, b: sor_pressure_pallas(cfg, phi, d, b))

    p0 = timeit("XLA sor_pressure", xla, s.phi, diag, rhs)
    try:
        p1 = timeit("Pallas in-VMEM (raised cap)", pls, s.phi, diag, rhs)
    except Exception as e:
        print(f"Pallas FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return
    d = np.abs(np.asarray(p0) - np.asarray(p1))
    print(f"max |diff| = {d.max():.3e}  (bitwise equal: "
          f"{np.array_equal(np.asarray(p0), np.asarray(p1))})", flush=True)


if __name__ == "__main__":
    main()
