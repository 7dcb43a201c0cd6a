"""Particle counting & binning (counting sort), fully on device.

Replaces the reference's three-stage binning — atomic histogram
(gpCountParticles.hlsl), a *serial CPU* exclusive prefix sum with a measured
52 ms/frame staging stall (Simulation.cpp:638-686), and an atomic counting-
sort scatter (gpBinParticles.hlsl) — with a device-side histogram scatter,
``jnp.cumsum``, and a stable sort.  No host round-trip.

Within-cell particle order: the reference's atomic scatter is
nondeterministic; ours is deterministic (original index order, via stable
sort).  Downstream P2G sums make the order irrelevant up to float
reassociation (SURVEY.md §7 "hard parts").

The offsets array uses the reference's x-fastest linearization
(cell = x + nx*(y + ny*z), gpParticleIndexing.hlsli) so offset semantics are
directly comparable.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SimConfig
from .common import cell_of


def bin_particles(cfg: SimConfig, pos, vel):
    """Returns (counts, cell_start, binned_pos, binned_vel, order).

    counts     : (nx, ny, nz) int32, particles per cell
    cell_start : (nx, ny, nz) int32, exclusive prefix sum in x-fastest order
                 (the reference's pre-shift gOffsets contents)
    order      : permutation applied to particles (argsort of cell id)
    """
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    m = jnp.array([nx, ny, nz], jnp.float32)
    cell = cell_of(pos * m)
    lin = cell[:, 0] + nx * (cell[:, 1] + ny * cell[:, 2])

    ncells = nx * ny * nz
    counts_lin = jnp.zeros(ncells, jnp.int32).at[lin].add(1)
    start_lin = jnp.cumsum(counts_lin) - counts_lin  # exclusive scan

    order = jnp.argsort(lin, stable=True)
    binned_pos = pos[order]
    binned_vel = vel[order]

    # Reshape x-fastest linear arrays back to [x, y, z] indexing.
    counts = counts_lin.reshape(nz, ny, nx).transpose(2, 1, 0)
    cell_start = start_lin.reshape(nz, ny, nx).transpose(2, 1, 0)
    return counts, cell_start, binned_pos, binned_vel, order
