"""128^3 A/B of the Pallas pair pack vs the XLA padded-layout twin.

Bit-equality + same-process timing (scalar-fetch protocol).  Run on TPU:
    JAX_PLATFORMS='' python scripts/diag_pairpack128.py [n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from fluidsimulation_tpu.core.pallas_pairpack import (
    pack_mac3_pair_pallas, pack_mac3_pair_padded)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, 0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0][0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)

    def mac():
        return (
            jnp.asarray(rng.standard_normal((n + 1, n, n)), jnp.float32),
            jnp.asarray(rng.standard_normal((n, n + 1, n)), jnp.float32),
            jnp.asarray(rng.standard_normal((n, n, n + 1)), jnp.float32),
        )

    A, B = mac(), mac()
    print("backend", jax.default_backend(), "grid", n)

    xla = jax.jit(pack_mac3_pair_padded)
    pls = jax.jit(pack_mac3_pair_pallas)

    t_x, out_x = timeit(xla, A, B)
    t_p, out_p = timeit(pls, A, B)
    eq = all(bool(jnp.all(a == b)) for a, b in zip(out_x, out_p))
    print(f"XLA padded pack : {t_x:8.1f} ms")
    print(f"Pallas pair pack: {t_p:8.1f} ms   bit-equal={eq}")


if __name__ == "__main__":
    main()
