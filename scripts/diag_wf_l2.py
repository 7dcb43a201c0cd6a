"""Level-2 pool knob sweep: skip margin (same-program), row width, P, spr.

Usage: python scripts/diag_wf_l2.py [grid] [steps]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render import interior as intr
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.experiments import wavefront as wf
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    for leaf in jax.tree_util.tree_leaves(x):
        jax.block_until_ready(leaf)
        jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, n=3):
    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=1 if grid >= 128 else 2)
    print(f"backend {jax.default_backend()}, grid {grid}^3", flush=True)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    fetch(state.phi)
    texp = rt.PackedPhi(state.phi)
    texs = intr.PackedPhiSkip(state.phi)
    inv = 1.0 / jnp.float32(grid)
    cam_pos, right, up, fwd = OrbitCamera().frame(800, 600)

    # Build the real level-2 ray set once.
    @jax.jit
    def rays_l2(texp):
        md = lambda p: rt.map_dist_packed(texp, p)  # noqa: E731
        px = (jnp.arange(800, dtype=jnp.float32) + 0.5) / 800
        py = (jnp.arange(600, dtype=jnp.float32) + 0.5) / 600
        fx, fy = jnp.meshgrid(px, py, indexing="xy")
        ci = rt._norm((-1 + 2 * fx)[..., None] * right
                      + (1 - 2 * fy)[..., None] * up + fwd).reshape(-1, 3)
        co = jnp.broadcast_to(jnp.asarray(cam_pos), ci.shape)
        _, prim_co, prim_ci, _, _ = rt.trace_glass(co, ci)
        ip1, d_a, w_a, d_b, w_b = rt._expand_bounce(md, inv, prim_co,
                                                    prim_ci)
        co2 = jnp.concatenate([ip1, ip1], axis=0)
        d2 = jnp.concatenate([d_a, d_b], axis=0)
        w2 = jnp.concatenate([w_a, w_b], axis=0)
        return co2, d2, w2

    co2, d2, w2 = rays_l2(texp)
    fetch(w2)
    co2e = co2 + 0.001 * d2
    half = jnp.array([0.5, 0.5, 0.5], jnp.float32)
    _, mt2, _, _ = rt.intersect_aabb(co2e, d2, -half, half)
    dead = w2 <= 0.0
    print(f"L2 rays {int(mt2.shape[0])}, marchable "
          f"{int(jnp.sum((mt2 < rt.LARGE) & ~dead))}", flush=True)

    @functools.partial(jax.jit, static_argnames=("p_", "c_", "reuse",
                                                  "fmt"))
    def pool(texq, co, ci, mt, dd, mgn, p_, c_, reuse, fmt):
        if fmt == "closure":
            md = lambda q: rt.map_dist_packed(texq, q)  # noqa: E731
            return wf.intersect_water_wf(md, inv, co, ci, mt, dead=dd,
                                         pool=p_, spr=c_, with_stats=True)
        return wf.intersect_water_wf(texq, inv, co, ci, mt, dead=dd,
                                     pool=p_, spr=c_, reuse=reuse,
                                     margin=mgn, with_stats=True)

    ref_t = None
    cases = [
        ("closure", texp, 0.0, 131072, 6, 1),
        ("tex", texp, 0.0, 131072, 6, 1),
        ("tex", texp, 0.0, 131072, 6, 2),
        ("tex", texp, 0.0, 131072, 6, 4),
        ("tex", texp, 0.0, 131072, 6, 6),
        ("tex", texp, 0.0, 131072, 12, 4),
        ("tex", texp, 0.0, 65536, 6, 4),
        ("tex", texs, 5.0, 131072, 6, 4),
        ("tex", texs, 5.0, 131072, 6, 6),
    ]
    for fmt, texq, mgn, P, spr, reuse in cases:
        ms, out = timeit(pool, texq, co2e, d2, mt2, dead,
                         jnp.float32(mgn), P, spr, reuse, fmt)
        st = jax.tree_util.tree_map(int, out[2])
        skipf = "skip" if isinstance(texq, intr.PackedPhiSkip) else "plain"
        tag = f"{fmt}/{skipf} P={P} C={spr} R={reuse}"
        print(f"{tag:36s}: {ms:8.1f} ms  rounds {st['rounds']}",
              flush=True)
        if ref_t is None:
            ref_t = out[1]
        else:
            d = np.abs(np.asarray(out[1]) - np.asarray(ref_t))
            if (d > 1e-5).mean() > 0.004:
                print(f"   WARNING t mismatch frac "
                      f"{(d > 1e-5).mean():.4f} max {d.max():.2e}",
                      flush=True)


if __name__ == "__main__":
    main()
