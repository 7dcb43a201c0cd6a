"""Fused-step A/B at 128^3: Pallas pair-pack kernel on vs off.

Two fresh jit wrappers of solver.step (so both trace in this process);
variant B monkeypatches pairpack_fits -> False before tracing.  Scalar-
fetch timing; only the intra-process ratio is load-bearing.

Usage (TPU): JAX_PLATFORMS='' python scripts/diag_step_pairpack.py [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core import pallas_pairpack
from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver import step3d


def fetch(state):
    jax.device_get(state.pos[0, 0])


def time_step(fn, state, dt, reps=8):
    s = fn(state, dt)
    fetch(s)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = fn(s, dt)
        fetch(s)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = SimConfig(nx=n, ny=n, nz=n, particles_per_cell_axis=1)
    state = init_state(cfg)
    dt = jnp.float32(1.0 / 60.0)
    print("backend", jax.default_backend(), "grid", n,
          "particles", state.pos.shape[0])

    # settle a few steps (default path) so both variants see the same state
    warm = jax.jit(lambda s, d: step3d.step(s, d, cfg, True))
    for _ in range(3):
        state = warm(state, dt)
    fetch(state)

    a = jax.jit(lambda s, d: step3d.step(s, d, cfg, True))
    t_a, _ = time_step(a, state, dt)
    print(f"A step, pallas pair-pack ON : {t_a:8.1f} ms")

    orig = pallas_pairpack.pairpack_fits
    pallas_pairpack.pairpack_fits = lambda dims: False
    try:
        b = jax.jit(lambda s, d: step3d.step(s, d, cfg, True))
        t_b, _ = time_step(b, state, dt)
    finally:
        pallas_pairpack.pairpack_fits = orig
    print(f"B step, XLA pack            : {t_b:8.1f} ms")
    print(f"delta (B - A)               : {t_b - t_a:8.1f} ms")


if __name__ == "__main__":
    main()
