"""Same-process A/B: full fused step WITH the AdvectCache vs WITHOUT
(cache=None), 10 chained steps each, alternated twice."""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(s):
    jax.block_until_ready(s)
    jax.device_get(s.vel.ravel()[0])


def run(state, cfg, dt, n=10):
    t0 = time.perf_counter()
    for _ in range(n):
        state = step_jit(state, dt, cfg)
    fetch(state)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
    dt = jnp.float32(1 / 60)
    sc = jax.device_put(init_state(cfg))
    sn = dataclasses.replace(sc, cache=None)

    # compile both variants
    sc1 = step_jit(sc, dt, cfg)
    fetch(sc1)
    sn1 = step_jit(sn, dt, cfg)
    fetch(sn1)

    for rnd in range(2):
        print(f"with cache   : {run(sc1, cfg, dt):8.1f} ms/step", flush=True)
        print(f"without cache: {run(sn1, cfg, dt):8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
