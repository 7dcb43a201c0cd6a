"""One-ring velocity extrapolation (gpExtrapolateParticleVelocities.hlsl).

Invalid faces neighboring any valid face take the mean of their valid
6-neighbors; other invalid faces become 0 ("well within the air").  The HLSL
kernel reads out-of-bounds as 0 and !isinf(0) is true, so out-of-bounds
neighbors count as valid zeros — replicated here by zero-padding both the
values and the validity mask with valid=True.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import shift


def extrapolate_one_ring(g, valid):
    num = jnp.zeros(g.shape, jnp.float32)
    tot = jnp.zeros(g.shape, jnp.float32)
    for axis in range(3):
        for s in (-1, 1):
            nb_val = shift(g, axis, s, 0.0)
            nb_ok = shift(valid, axis, s, True)  # OOB reads are "valid zeros"
            num = num + nb_ok
            tot = tot + jnp.where(nb_ok, nb_val, 0.0)
    mean = jnp.where(num > 0, tot / jnp.maximum(num, 1.0), 0.0)
    return jnp.where(valid, g, mean)
