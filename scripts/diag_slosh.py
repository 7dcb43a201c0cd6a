"""Does step time grow as the dam break sloshes (overflow path)?  Times
step_jit and step_guarded in 10-step windows from init at 128^3."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.celltable import build_cell_table
from fluidsimulation_tpu.solver.step3d import step_guarded, step_jit


def fetch(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])


def main():
    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
    dt = 1.0 / 60.0
    bt = jax.jit(lambda s: build_cell_table(cfg, s.pos, s.vel).n_overflow)

    for name, fn in (("step_jit", lambda s: step_jit(s, dt, cfg)),
                     ("step_guarded", lambda s: step_guarded(s, dt, cfg)[0])):
        state = jax.device_put(init_state(cfg))
        state = fn(state)
        fetch(state)
        for w in range(8):
            t0 = time.perf_counter()
            for _ in range(10):
                state = fn(state)
            fetch(state)
            el = (time.perf_counter() - t0) / 10
            print(f"{name}: steps {10*w+1}-{10*w+10}: {el*1e3:7.1f} ms/step  "
                  f"n_overflow={int(bt(state))}", flush=True)


if __name__ == "__main__":
    main()
