"""Round-5 256^3 fused-step A/B: XLA supercell P2G (the round-4 program)
vs the new z-blocked Pallas super-P2G, SAME PROCESS (the only trustworthy
comparison through the drifting tunnel — CLAUDE.md).  Alternates the two
compiled programs step-by-step so slow-state drift cancels.

Usage (TPU, solo): python scripts/diag_r5_256_ab.py [n]
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
from fluidsimulation_tpu.solver import step3d
from fluidsimulation_tpu.ops import pallas_p2g_super as pps


def fetch(s):
    jax.block_until_ready(s)
    jax.device_get(np.asarray(s.vel).ravel()[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = SimConfig(nx=n, ny=n, nz=n, cells_per_meter=float(n),
                    particles_per_cell_axis=1)
    print("backend", jax.default_backend(), "grid", n,
          "particles", cfg.num_particles, flush=True)

    real_fits = pps.super_p2g_fits

    def make(fits):
        # The carried advect cache's row padding depends on the P2G path,
        # and init_state's zero cache is one retrace away from the step's
        # fixed point — so trace BOTH variants (init-shape + fixed-point)
        # under the patch via a plain jit; later calls hit the compiled
        # cache and never consult the gate again.
        pps.super_p2g_fits = (lambda *a, **k: False) if not fits else real_fits
        try:
            stepf = jax.jit(lambda s, dt: step3d.step(s, dt, cfg))
            s = jax.device_put(init_state(cfg))
            s = stepf(s, 1.0 / 60.0)
            s = stepf(s, 1.0 / 60.0)
            fetch(s)
        finally:
            pps.super_p2g_fits = real_fits
        return stepf, s

    t0 = time.perf_counter()
    f_xla, sa = make(False)
    print(f"compile XLA-P2G step: {time.perf_counter()-t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    f_pal, sb = make(True)
    print(f"compile Pallas-P2G step: {time.perf_counter()-t0:.0f} s",
          flush=True)

    # The two programs carry different advect-cache paddings (the Pallas
    # P2G pads its row tables differently), so each steps its OWN state,
    # in lockstep, interleaved so slow-state drift cancels.
    for _ in range(3):
        sa = f_xla(sa, 1.0 / 60.0)
    fetch(sa)
    for _ in range(3):
        sb = f_pal(sb, 1.0 / 60.0)
    fetch(sb)

    ta, tb = [], []
    for i in range(10):
        t0 = time.perf_counter()
        sa = f_xla(sa, 1.0 / 60.0)
        fetch(sa)
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sb = f_pal(sb, 1.0 / 60.0)
        fetch(sb)
        tb.append(time.perf_counter() - t0)
        print(f"  step {i}: xla {ta[-1]:.2f} s  pallas {tb[-1]:.2f} s",
              flush=True)
    # Drop each program's first timed execution (first-execution tunnel
    # stall, docs/PERF.md round 4).
    print(f"XLA-P2G step:    median {np.median(ta[1:]):.2f} s  best "
          f"{min(ta[1:]):.2f}", flush=True)
    print(f"Pallas-P2G step: median {np.median(tb[1:]):.2f} s  best "
          f"{min(tb[1:]):.2f}", flush=True)
    r = np.array(tb[1:]) / np.array(ta[1:])
    print(f"pallas/xla per-pair ratio: median {np.median(r):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
