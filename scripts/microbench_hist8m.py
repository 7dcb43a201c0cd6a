"""End-to-end one-hot histogram replacement at the PHYSICAL config's shape:
8M sorted cell keys -> 2M bins (128^3/ppc2), vs the scatter-add baseline.

The round-4 roofline microbench (microbench_onehot.py) measured the raw
one-hot rate 0.55-0.62x the scatter rate at W=512 — but on a SHARED
window, without the global window scatter or the out-of-window spill
handling a real per-block-base histogram needs.  This measures the whole
replacement on REAL sorted keys from the physical config's particle
distribution (dam-break block + margin gaps), exactness-checked.

Usage (TPU): python scripts/microbench_hist8m.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops.binning import cell_of


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def timeit(name, f, *args, n=5, rounds=3):
    out = f(*args)
    fetch(out[0] if isinstance(out, tuple) else out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        fetch(out[0] if isinstance(out, tuple) else out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:40s} {best * 1e3:8.2f} ms", flush=True)
    return best, out


@functools.partial(jax.jit, static_argnames=("ncells",))
def hist_scatter(lin, ncells):
    return jnp.zeros(ncells, jnp.int32).at[lin].add(1, mode="drop")


@functools.partial(jax.jit, static_argnames=("ncells", "w", "block", "cap"))
def hist_onehot(lin_s, ncells, w, block, cap):
    """Exact histogram of SORTED keys: blocked one-hot MXU matmuls over
    per-block windows [base_b, base_b + w), a window scatter, and a
    bounded spill scatter.  Returns (counts, n_spill); exact iff
    n_spill <= cap (the caller falls back otherwise)."""
    n = lin_s.shape[0]
    npad = -n % block
    keys = (jnp.concatenate([lin_s, jnp.full(npad, ncells, jnp.int32)])
            if npad else lin_s)
    kb = keys.reshape(-1, block)
    bases = kb[:, 0]
    off = kb - bases[:, None]  # >= 0 (sorted)
    iw = jnp.arange(w, dtype=jnp.int32)

    def body(ob):
        # off >= w rows one-hot to nothing; sentinel slots scatter OOB
        # (mode=drop).  Counts <= block fit bf16-accum-f32 exactly.
        oh = (ob[:, None] == iw[None, :]).astype(jnp.bfloat16)
        ones = jnp.ones((8, block), jnp.bfloat16)
        return jax.lax.dot(ones, oh, preferred_element_type=jnp.float32)[0]

    wins = jax.lax.map(body, off)  # (nb, w) exact integer-valued f32
    counts = jnp.zeros(ncells, jnp.int32).at[
        (bases[:, None] + iw[None, :]).reshape(-1)
    ].add(wins.astype(jnp.int32).reshape(-1), mode="drop")

    spill = (off >= w).reshape(-1) & (keys < ncells)
    n_spill = spill.sum()
    pos = jnp.nonzero(spill, size=cap, fill_value=keys.shape[0])[0]
    live = pos < keys.shape[0]
    skey = jnp.where(live, keys[jnp.minimum(pos, keys.shape[0] - 1)], 0)
    counts = counts.at[skey].add(live.astype(jnp.int32), mode="drop")
    return counts, n_spill


def main():
    grid, ppc = 128, 2
    cfg = SimConfig(nx=grid, ny=grid, nz=grid, cells_per_meter=float(grid),
                    particles_per_cell_axis=ppc)
    ncells = grid ** 3
    print(f"backend {jax.default_backend()}  N={cfg.num_particles}  "
          f"ncells={ncells}", flush=True)

    # Real particle distribution: init + a few steps of the physical config.
    from fluidsimulation_tpu.solver.step3d import step_jit

    state = jax.device_put(init_state(cfg))
    for _ in range(3):
        state = step_jit(state, jnp.float32(1 / 120), cfg)
    fetch(state.vel)
    m = jnp.array([grid] * 3, jnp.float32)
    cell = cell_of(state.pos * m)
    lin = ((cell[:, 0] * grid + cell[:, 1]) * grid + cell[:, 2])
    lin_s = jax.lax.sort(lin)
    fetch(lin_s)

    _, want = timeit("scatter-add baseline", hist_scatter, lin, ncells)
    want_np = np.asarray(want)
    for w, block in [(512, 4096), (1024, 4096), (2048, 4096), (512, 8192)]:
        cap = 1 << 18
        t, (got, n_spill) = timeit(
            f"onehot W={w} B={block} (+scatter+spill)", hist_onehot,
            lin_s, ncells, w, block, cap)
        ns = int(n_spill)
        ok = (ns <= cap) and np.array_equal(np.asarray(got), want_np)
        print(f"    n_spill={ns} ({100 * ns / cfg.num_particles:.2f}%)  "
              f"exact={ok}", flush=True)


if __name__ == "__main__":
    main()
