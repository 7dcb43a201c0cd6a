"""Body forces (gravity) — gpAddBodyForces.hlsl.

Adds g*dt to interior V faces only (the edge guard at
gpAddBodyForces.hlsl:15 keeps wall-normal faces at 0, preserving the
compatibility condition; the CPU solver instead adds everywhere and re-zeroes
edges inside Project — same post-projection state).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SimConfig


def add_gravity(cfg: SimConfig, v, dt):
    ny = cfg.ny
    return v.at[:, 1:ny, :].add(jnp.float32(cfg.gravity_y) * dt)
