"""Round-3 renderer attribution at 128^3 settled state (same-process A/B).

  A  tiled 64x100 (incumbent)
  B  wavefront reuse sweep (does the row-reuse eval overhead pay?)
  C  L1 pool-only with stats (rounds vs reuse: does reuse cut rounds?)
  D  dense gradient leg standalone (the 5.8M-row cost the pool skips)

Usage: python scripts/diag_wf_r4.py [grid] [steps]
Only intra-process ratios are load-bearing (tunnel perf-state drift).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.experiments import wavefront as wf
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.solver.step3d import step_jit


def fetch(x):
    for leaf in jax.tree_util.tree_leaves(x):
        jax.block_until_ready(leaf)
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, n=3):
    out = fn()
    fetch(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
            fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3, out


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = SimConfig(
        nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
        particles_per_cell_axis=1 if grid >= 128 else 2,
    )
    print(f"backend {jax.default_backend()}, grid {grid}^3", flush=True)
    state = jax.device_put(init_state(cfg))
    for _ in range(steps):
        state = step_jit(state, jnp.float32(1 / 60), cfg)
    fetch(state.phi)
    tex = rt.PackedPhi(state.phi)
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    t_ref, img_ref = timeit(
        lambda: rt.render(tex, co, right, up, fwd, 800, 600, band_rows=64)
    )
    print(f"A tiled 64x100          : {t_ref:8.1f} ms/frame", flush=True)

    for reuse, skip in [(1, False), (2, False), (4, False), (1, True)]:
        t_wf, img = timeit(
            lambda: wf.render_wavefront(
                state.phi, co, right, up, fwd, 800, 600,
                pool=131072, spr=6, skip=skip, reuse=reuse)
        )
        d = float(jnp.abs(img - img_ref).mean())
        print(f"B wf reuse={reuse} skip={int(skip)}     : {t_wf:8.1f} "
              f"ms/frame (mean|diff| {d:.2e})", flush=True)

    # C: L1 pool alone, with stats.
    px = (jnp.arange(800, dtype=jnp.float32) + 0.5) / 800
    py = (jnp.arange(600, dtype=jnp.float32) + 0.5) / 600
    fx, fy = jnp.meshgrid(px, py, indexing="xy")
    u = -1.0 + 2.0 * fx
    v = 1.0 - 2.0 * fy
    ci = rt._norm(u[..., None] * right + v[..., None] * up + fwd)
    cof = jnp.broadcast_to(co, ci.shape).reshape(-1, 3)
    cif = ci.reshape(-1, 3)
    h, prim_co, prim_ci, _, _ = jax.jit(rt.trace_glass)(cof, cif)
    prim_co = prim_co + 0.001 * prim_ci
    half = jnp.array([0.5, 0.5, 0.5], jnp.float32)
    _, max_t, _, _ = rt.intersect_aabb(prim_co, prim_ci, -half, half)
    inv_m0 = 1.0 / jnp.float32(grid)
    fetch((prim_co, prim_ci, max_t))

    for reuse in (1, 4):
        poolf = jax.jit(
            lambda tex, co_, ci_, mt: wf.intersect_water_wf(
                tex, inv_m0, co_, ci_, mt, pool=131072, spr=6,
                with_stats=True, reuse=reuse),
            static_argnames=(),
        )
        t_l1, out = timeit(lambda: poolf(tex, prim_co, prim_ci, max_t))
        stats = {k: int(v) for k, v in out[2].items()}
        print(f"C L1 pool reuse={reuse}       : {t_l1:8.1f} ms  {stats}",
              flush=True)

    # D: dense gradient leg standalone at L1+L2 sizes (1.44M probes x 4).
    md = lambda p: rt.map_dist_packed(tex, p)
    pts = jnp.concatenate([prim_co + 0.5, prim_co + 0.5, prim_co + 0.5])
    gradf = jax.jit(lambda tex, p: rt.compute_gradient(
        lambda q: rt.map_dist_packed(tex, q), p))
    t_g, _ = timeit(lambda: gradf(tex, pts))
    print(f"D dense gradient 1.44Mx4: {t_g:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
