"""Does splitting one big row gather into independent chunk gathers overlap?
Plus: real advect_rk3/flip cost with the combined table at 128^3.

Note: pass big arrays as jit ARGS, never closures — the axon tunnel compiles
remotely and closure constants blow the HTTP request limit (HTTP 413).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


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
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    M = 2_097_152
    Q = 1_000_188
    key = jnp.asarray(rng.integers(0, M, Q).astype(np.int32))
    tab = jnp.asarray(rng.standard_normal((M, 64)).astype(np.float32))

    timeit("1 gather of 1M x 64L", lambda k, t: t[k].sum(1), key, tab)

    def split(k, t, parts):
        n = k.shape[0] // parts
        outs = [t[k[i * n : (i + 1) * n]].sum(1) for i in range(parts)]
        outs.append(t[k[parts * n :]].sum(1))
        return jnp.concatenate(outs)

    for p in (2, 4, 8):
        timeit(f"{p} split gathers of {Q//p//1000}K x 64L",
               lambda k, t, p=p: split(k, t, p), key, tab)

    # 3 dependent gathers (RK-stage-like chain) vs 3 independent
    def chain(k, t):
        a = t[k].sum(1)
        k2 = (k + a.astype(jnp.int32) % 7) % M
        b = t[k2].sum(1)
        k3 = (k2 + b.astype(jnp.int32) % 5) % M
        return t[k3].sum(1)

    timeit("3 DEPENDENT gathers 1M x 64L", chain, key, tab)

    def indep(k, t):
        return t[k].sum(1) + t[(k + 13) % M].sum(1) + t[(k + 29) % M].sum(1)

    timeit("3 INDEPENDENT gathers 1M x 64L", indep, key, tab)

    from fluidsimulation_tpu.core.config import SimConfig
    from fluidsimulation_tpu.core.state import init_state
    from fluidsimulation_tpu.ops.advect import advect_rk3
    from fluidsimulation_tpu.ops.flip import flip_update

    cfg = SimConfig(nx=128, ny=128, nz=128, cells_per_meter=128.0,
                    particles_per_cell_axis=1)
    state = jax.device_put(init_state(cfg))
    dt = jnp.float32(1 / 60)
    timeit("advect_rk3 combined (128^3, 1M)",
           lambda s: advect_rk3(cfg, s.u, s.v, s.w, s.pos, dt), state)
    timeit("flip_update combined",
           lambda s: flip_update(cfg, s.pos, s.vel, s.u, s.v, s.w,
                                 s.u, s.v, s.w, 0.01), state)


if __name__ == "__main__":
    main()
