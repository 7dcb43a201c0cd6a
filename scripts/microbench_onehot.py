"""MXU one-hot-matmul as a gather/histogram replacement: measured yes/no
(VERDICT r3 item 8 — the one untried mechanism against the ~85 ms
gather/sort/scatter floor of the 104 ms step).

Idea: a gather of D-lane rows out[i] = T[idx[i]] is a matmul
onehot(idx) @ T, and a histogram is onehot(idx)^T @ 1 — both MXU work at
~200 bf16 TFLOP/s instead of the memory system's ~7-10 ns/row gather /
~9 ns/elem scatter transaction floors.  The catch: the one-hot operand is
M x W.  Materialized in HBM it costs M*W bytes of bandwidth (dead for any
useful W); the question is whether XLA fuses the iota-compare producer
into the dot (operands stream from VMEM) when blocked to VMEM-size tiles.
The real op would be applied on SORTED keys, where a W-cell window covers
a whole block of particles (the table build already sorts).

Measures, at 1M rows:
  A. XLA gather, 128-lane rows (the step/render workhorse)  [baseline]
  B. XLA scatter-add histogram into 2M bins                  [baseline]
  C. one-hot matmul gather, W=512/2048 shared window, blocked
  D. one-hot matmul histogram, same windows
Effective ns/row for each, plus equality checks vs A/B.

Usage (TPU): python scripts/microbench_onehot.py
"""

import sys
import time

sys.path.insert(0, ".")

from fluidsimulation_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

M = 1_048_576  # 2^20: divisible by the block sizes
NBINS = 2_000_000
LANES = 128


def fetch(x):
    jax.block_until_ready(x)
    jax.device_get(x.ravel()[0])


def timeit(name, f, *args, n=5, rounds=2):
    out = f(*args)
    fetch(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best * 1e3:8.2f} ms  ({best / M * 1e9:6.2f} ns/row)",
          flush=True)
    return best, out


@jax.jit
def gather128(T, idx):
    return T[idx]


@jax.jit
def hist_scatter(idx):
    return jnp.zeros(NBINS, jnp.int32).at[idx].add(1)


@functools.partial(jax.jit, static_argnames=("w", "block"))
def onehot_gather(Tw, idx, w, block):
    """out[i] = Tw[idx[i]] with idx in [0, w), as blocked one-hot matmuls."""
    iw = jnp.arange(w, dtype=jnp.int32)
    Tb = Tw.astype(jnp.bfloat16)

    def body(ib):
        oh = (ib[:, None] == iw[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot(
            oh, Tb, precision=None,
            preferred_element_type=jnp.float32,
        )

    return jax.lax.map(body, idx.reshape(-1, block)).reshape(-1, Tw.shape[1])


@functools.partial(jax.jit, static_argnames=("w", "block"))
def onehot_hist(idx, w, block):
    """counts[c] = #(idx == c), idx in [0, w): ones @ onehot per block."""
    iw = jnp.arange(w, dtype=jnp.int32)

    def body(ib):
        oh = (ib[:, None] == iw[None, :]).astype(jnp.bfloat16)
        ones = jnp.ones((8, block), jnp.bfloat16)
        return jax.lax.dot(
            ones, oh, preferred_element_type=jnp.float32
        )[0]

    return jax.lax.map(body, idx.reshape(-1, block)).sum(0)


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.standard_normal((NBINS, LANES)), jnp.float32)
    idx_full = jnp.asarray(rng.integers(0, NBINS, M), jnp.int32)

    _, want_g = timeit("A gather 128-lane (baseline)", gather128, T, idx_full)
    _, want_h = timeit("B scatter histogram (baseline)", hist_scatter,
                       idx_full)

    for w in (512, 2048):
        Tw = T[:w]
        idx_w = jnp.asarray(rng.integers(0, w, M), jnp.int32)
        ref = np.asarray(gather128(Tw, idx_w))
        refh = np.bincount(np.asarray(idx_w), minlength=w)
        for block in (4096, 16384):
            _, got = timeit(f"C onehot gather  W={w} block={block}",
                            onehot_gather, Tw, idx_w, w, block)
            err = np.abs(np.asarray(got) - ref).max()
            rel = err / (np.abs(ref).max() + 1e-9)
            print(f"    max abs err {err:.4f} (rel {rel:.4f}, bf16 onehot "
                  f"x f32 table)", flush=True)
            _, goth = timeit(f"D onehot hist    W={w} block={block}",
                             onehot_hist, idx_w, w, block)
            ok = np.array_equal(np.asarray(goth).astype(np.int64), refh)
            print(f"    hist exact: {ok}", flush=True)


if __name__ == "__main__":
    main()
