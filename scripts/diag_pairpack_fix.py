"""Probe Mosaic lowering options for the pair-pack fat-row assembly.

The committed kernel's (T, ns*8, L) -> (T*ns, 8*L) reshape fails on the
real backend ("infer-vector-layout: unsupported shape cast").  Candidates:

  A. lane-dim concat: row = concatenate([c0..c7], axis=-1) -> (T, 256),
     then stack over s + collapse-outer reshape (the pallas_pack pattern).
  B. matmul placement: row = sum_c seg_c @ E_c with E_c a (32, 256)
     0/1 selection matrix (exact for finite inputs).

Run on TPU: JAX_PLATFORMS='' python scripts/diag_pairpack_fix.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 32
T = 64
NS = 5


def make_inputs():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.standard_normal((2, T, L)), jnp.float32)
            for _ in range(8 * NS)]


def want(ins):
    # row (t, s) = concat over c of ins[s*8+c][c % 2? no: dx from block]
    cols = []
    for s in range(NS):
        row = jnp.concatenate([ins[s * 8 + c][0] for c in range(8)], axis=-1)
        cols.append(row)
    st = jnp.stack(cols, axis=1)  # (T, NS, 256)
    return st.reshape(T * NS, 8 * L)


def kernel_concat(*refs):
    out_ref = refs[-1]
    cols = []
    for s in range(NS):
        row = jnp.concatenate(
            [refs[s * 8 + c][0] for c in range(8)], axis=-1
        )
        cols.append(row)
    st = jnp.stack(cols, axis=1)
    out_ref[:] = st.reshape(T * NS, 8 * L)


def kernel_matmul(*refs):
    out_ref = refs[-1]
    eye = jnp.eye(L, dtype=jnp.float32)
    cols = []
    for s in range(NS):
        acc = jnp.zeros((T, 8 * L), jnp.float32)
        for c in range(8):
            sel = jnp.pad(eye, ((0, 0), (c * L, (7 - c) * L)))
            acc = acc + jnp.dot(refs[s * 8 + c][0], sel,
                                preferred_element_type=jnp.float32)
        cols.append(acc)
    st = jnp.stack(cols, axis=1)
    out_ref[:] = st.reshape(T * NS, 8 * L)


def run(kern, name):
    ins = make_inputs()
    spec = pl.BlockSpec((pl.Element(2), pl.Element(T), pl.Element(L)),
                        lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((T * NS, 8 * L), lambda: (0, 0),
                            memory_space=pltpu.VMEM)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T * NS, 8 * L), jnp.float32),
            in_specs=[spec] * (8 * NS),
            out_specs=out_spec,
        )(*ins)
        ref = want(ins)
        ok = bool(jnp.all(out == ref))
        print(f"{name}: compiled, bit-equal={ok}")
    except Exception as e:
        print(f"{name}: FAILED — {str(e)[:300]}")


if __name__ == "__main__":
    print("backend", jax.default_backend())
    run(kernel_concat, "A concat")
    run(kernel_matmul, "B matmul")
