"""Clean-protocol 256^3 render timing (round 5): one resident phi only
(the extra-HBM-residents artifact silently 4-5x's big-grid programs —
CLAUDE.md), frames timed individually, first post-compile execution
dropped.  Round-4 record: ~890-900 ms/frame (pre sphere-trace default).

Usage (TPU, solo): python scripts/diag_r5_render256.py [n_steps] [n_frames]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.solver.step3d import step_jit
from fluidsimulation_tpu.render.camera import OrbitCamera
from fluidsimulation_tpu.render.raytrace import render_frame


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n = 256
    cfg = SimConfig(nx=n, ny=n, nz=n, cells_per_meter=float(n),
                    particles_per_cell_axis=1)
    s = jax.device_put(init_state(cfg))
    for _ in range(n_steps):
        s = step_jit(s, 1.0 / 60.0, cfg)
    jax.block_until_ready(s.pos)
    phi = s.phi
    del s  # ONE resident: the extra-residents artifact otherwise applies
    co, right, up, fwd = OrbitCamera().frame(800, 600)

    def draw():
        img = render_frame(phi, co, right, up, fwd, width=800, height=600,
                           band_rows=100)
        jax.block_until_ready(img)
        jax.device_get(np.asarray(img).ravel()[0])
        return img

    t0 = time.perf_counter()
    img = draw()
    print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
    assert np.isfinite(np.asarray(img)).all()
    times = []
    for i in range(n_frames):
        t0 = time.perf_counter()
        draw()
        times.append(time.perf_counter() - t0)
        print(f"frame {i}: {times[-1]*1e3:.0f} ms", flush=True)
    print(f"median {np.median(times)*1e3:.0f} ms  best "
          f"{min(times)*1e3:.0f}", flush=True)


if __name__ == "__main__":
    main()
