"""A/B the carried-cache paths at 128^3: advect_rk3 vs cached, flip_update
vs flip_update_carry, pack_mac3 single vs double+concat."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.core.interp_packed import pack_mac3
from fluidsimulation_tpu.ops.advect import advect_rk3, advect_rk3_cached
from fluidsimulation_tpu.ops.flip import flip_update, flip_update_carry
from fluidsimulation_tpu.solver.step3d import step_jit


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
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms", flush=True)
    return out


def main():
    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    s = step_jit(s, jnp.float32(1 / 60), cfg)   # one step: real grids+cache
    fetch(s.pos)
    dt = jnp.float32(1 / 60)
    alpha = jnp.float32(0.05)

    timeit("advect_rk3 (pack + 9 gathers)",
           lambda st: advect_rk3(cfg, st.u, st.v, st.w, st.pos, dt), s)
    timeit("advect_rk3_cached (6 gathers)",
           lambda st: advect_rk3_cached(cfg, st.cache, st.pos, dt), s)
    timeit("flip_update (1 pack + 3 gathers)",
           lambda st: flip_update(cfg, st.pos, st.vel, st.u, st.v, st.w,
                                  st.u, st.v, st.w, alpha), s)
    timeit("flip_update_carry (2 packs + concat + 3 fat)",
           lambda st: flip_update_carry(cfg, st.pos, st.vel, st.u, st.v,
                                        st.w, st.u, st.v, st.w, alpha), s)
    timeit("pack_mac3 x1", lambda st: pack_mac3(st.u, st.v, st.w), s)

    def pack2cat(st):
        pa = pack_mac3(st.u, st.v, st.w)
        pb = pack_mac3(st.u, st.v, st.w)
        return tuple(jnp.concatenate([a, b], axis=1) for a, b in zip(pa, pb))

    timeit("pack_mac3 x2 + concat", pack2cat, s)
    timeit("FULL step (cached)", lambda st: step_jit(st, dt, cfg), s)


if __name__ == "__main__":
    main()
