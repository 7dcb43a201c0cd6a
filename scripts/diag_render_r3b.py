"""Renderer A/B at 128^3 settled state: Phi9 gradient + speculative march.

Variants (fresh jit wrappers so each traces in this process — the module
_SPEC global is read at trace time):

  A  tiled 64x100, serial march (_SPEC=1), md-tap gradient   (round-2 path)
  B  tiled + speculative march (_SPEC=8)
  C  tiled + Phi9 single-gather gradient
  D  tiled + both                                            (new default)

Image equality asserted vs A (bit-exact claim).  Scalar-fetch timing;
intra-process ratios only.

Usage (TPU): JAX_PLATFORMS='' python scripts/diag_render_r3b.py [grid] [steps]
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
from fluidsimulation_tpu.render import raytrace as rt
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.solver.step3d import step_jit

W, H = 800, 600


def timeit(fn, reps=4):
    img = fn()
    jax.device_get(img.ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        img = fn()
        jax.device_get(img.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, np.asarray(img)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cfg = SimConfig(nx=n, ny=n, nz=n, particles_per_cell_axis=1)
    state = init_state(cfg)
    dt = jnp.float32(1.0 / 60.0)
    for _ in range(steps):
        state = step_jit(state, dt, cfg)
    jax.device_get(state.pos[0, 0])
    phi = state.phi
    print("backend", jax.default_backend(), "grid", n, "settled", steps)

    co, right, up, fwd = OrbitCamera().frame(W, H)
    tex = rt.PackedPhi(phi)
    g9 = rt.PackedPhi9(phi)

    scan_raw = rt._render_scan.__wrapped__

    def make(spec, use_g9):
        rt._SPEC = spec
        f = jax.jit(
            functools.partial(scan_raw, width=W, height=H,
                              tile_h=64, tile_w=100),
        )
        g = g9 if use_g9 else None
        # close over args; trace now (while _SPEC holds)
        def run():
            return f(tex, co, right, up, fwd, g9=g)
        t, img = timeit(run)
        return t, img

    t_a, img_a = make(1, False)
    print(f"A tiled serial, md-taps : {t_a:8.1f} ms")
    t_b, img_b = make(8, False)
    print(f"B + spec march (_SPEC=8): {t_b:8.1f} ms   eq={np.array_equal(img_a, img_b)}")
    t_c, img_c = make(1, True)
    print(f"C + Phi9 gradient       : {t_c:8.1f} ms   eq={np.array_equal(img_a, img_c)}")
    t_d, img_d = make(8, True)
    print(f"D + both (new default)  : {t_d:8.1f} ms   eq={np.array_equal(img_a, img_d)}")
    for name, im in (("B", img_b), ("C", img_c), ("D", img_d)):
        d = np.abs(im - img_a)
        print(f"  {name} vs A: mean|diff| {d.mean():.3e} max {d.max():.3e}")


if __name__ == "__main__":
    main()
