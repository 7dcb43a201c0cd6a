"""Same-process anatomy of the FLIP stage (~54 ms standalone at 128^3 warm,
scripts/diag_step_floor.py) + the overflow-extraction primitives.

Times: diff grids, pair pack (Pallas vs XLA), the fat pair interp
(gathers + eval), the cache half-slice, full flip_update_carry both ways;
and nonzero(size=4096) / cumsum over 1M (find_overflow's remaining cost).

Usage (TPU): python scripts/diag_flip_parts.py [grid] [warm]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import pic_flip_alpha, step_jit


def fetch(x):
    # ONE scalar fetch: per-leaf device_gets are each a blocking tunnel
    # round trip and inflate small-op timings (see diag_step_floor.py).
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            jax.device_get(leaf.ravel()[0])
            return


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fetch(out)
    print(f"  {name:46s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
          flush=True)
    return out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1)
    dt = jnp.float32(1 / 60)
    s = jax.device_put(init_state(cfg))
    for _ in range(warm):
        s = step_jit(s, dt, cfg)
    fetch(s)
    print("backend", jax.default_backend(), "grid", grid, "warm", warm,
          flush=True)

    from fluidsimulation_tpu.core.interp_packed import (
        interp_mac3_packed_pair_vec,
        pack_mac3_pair,
    )
    from fluidsimulation_tpu.core.pallas_pairpack import pack_mac3_pair_pallas
    from fluidsimulation_tpu.ops.flip import flip_update_carry

    alpha = pic_flip_alpha(cfg, dt)
    # Use the carried grids as a stand-in for (new, old): same shapes/layout.
    u, v, w = s.u, s.v, s.w
    old = (u * 0.97, v * 0.97, w * 0.97)

    f_diff = jax.jit(lambda a, b, c: (a - (1 - alpha) * old[0],
                                      b - (1 - alpha) * old[1],
                                      c - (1 - alpha) * old[2]))
    diff = f_diff(u, v, w)
    timeit("diff grids (3 elementwise)", f_diff, u, v, w)

    f_packp = jax.jit(lambda d, g: pack_mac3_pair_pallas(d, g))
    fat = f_packp(diff, (u, v, w))
    timeit("pair pack (Pallas kernel)", f_packp, diff, (u, v, w))
    f_packx = jax.jit(lambda d, g: pack_mac3_pair(d, g))
    timeit("pair pack (XLA)", f_packx, diff, (u, v, w))

    m = jnp.array([cfg.nx, cfg.ny, cfg.nz], jnp.float32)
    pc = s.pos * m
    f_interp = jax.jit(lambda f0, f1, f2, p: interp_mac3_packed_pair_vec(
        f0, f1, f2, (cfg.nx, cfg.ny, cfg.nz), p))
    timeit("fat pair interp (gathers + eval both halves)",
           f_interp, fat[0], fat[1], fat[2], pc)

    L = fat[0].shape[1] // 2
    f_slice = jax.jit(lambda f0, f1, f2: (f0[:, L:], f1[:, L:], f2[:, L:]))
    timeit("cache half-slice (3 table copies)", f_slice,
           fat[0], fat[1], fat[2])

    f_flip_p = jax.jit(lambda p, vl: flip_update_carry(
        cfg, p, vl, u, v, w, *old, alpha, pallas=True))
    timeit("flip_update_carry (pallas pack)", f_flip_p, s.pos, s.vel)
    f_flip_x = jax.jit(lambda p, vl: flip_update_carry(
        cfg, p, vl, u, v, w, *old, alpha, pallas=False))
    timeit("flip_update_carry (XLA pack)", f_flip_x, s.pos, s.vel)

    # --- overflow-extraction primitives
    n = s.pos.shape[0]
    key = jax.random.PRNGKey(1)
    over = jax.random.uniform(key, (n,)) < 0.1
    timeit("primitive: cumsum 1M i32",
           jax.jit(lambda o: jnp.cumsum(o.astype(jnp.int32))), over)
    timeit("primitive: nonzero(size=4096) over 1M",
           jax.jit(lambda o: jnp.nonzero(o, size=4096, fill_value=n)[0]),
           over)


if __name__ == "__main__":
    main()
