"""Initial-condition generators (dam break seeding).

Replicates GPFluidSim::ResetSimulation (Simulation.cpp:39-90): a jittered
2x2x2-per-cell block of particles filling the right half of the domain
(x in [nx/2, nx-1), y,z in [1, n-1)), with positions in *meters* and zero
initial velocity.  The jitter stream is a minstd LCG seeded with cfg.seed
(see core/lcg.py), consumed in exactly the reference's loop order
(z, y, x, u, v, w, then the 3 coordinate draws).

Also provides the CPU 3D solver's noise-grid initialization
(Simulation3D.cpp:41-71): U/V/W filled with uniform(-0.25,0.25) noise, with
particle velocities sampled from the noise field (Simulation3D.cpp:92).
"""

from __future__ import annotations

import numpy as np

from .config import SimConfig
from .lcg import minstd_uniform_stream


def dam_break_particles(cfg: SimConfig, skip: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Return (pos, vel) float32 arrays of shape (N, 3), N = cfg.num_particles.

    Positions are in meters (domain [0, n/cells_per_meter)); velocities zero,
    matching the GPU path (Simulation.cpp:66-68).
    """
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    cpm = np.float32(cfg.cells_per_meter)
    ppc = cfg.particles_per_cell_axis

    xs = np.arange(nx // 2, nx - 1, dtype=np.float32)
    ys = np.arange(1, ny - 1, dtype=np.float32)
    zs = np.arange(1, nz - 1, dtype=np.float32)
    us = np.arange(ppc, dtype=np.float32)

    # Loop order: z, y, x, u, v, w (Simulation.cpp:47-59).
    Z, Y, X, U, V, W = np.meshgrid(zs, ys, xs, us, us, us, indexing="ij")

    # Cell base position, offset by -0.25 cells (Simulation.cpp:50-52).
    base = np.stack(
        [
            (X.ravel() - 0.25) / cpm,
            (Y.ravel() - 0.25) / cpm,
            (Z.ravel() - 0.25) / cpm,
        ],
        axis=-1,
    )
    d = np.float32(0.5 / cpm) * (2.0 / ppc)  # reference uses ppc=2 -> d = 0.5/cpm
    if ppc == 2:
        d = np.float32(0.5 / cpm)
    sub = np.stack([U.ravel(), V.ravel(), W.ravel()], axis=-1) * d

    n = base.shape[0]
    jitter = minstd_uniform_stream(3 * n, -0.25, 0.25, seed=cfg.seed, skip=skip).reshape(n, 3)
    pos = (base + sub + jitter / cpm).astype(np.float32)
    vel = np.zeros_like(pos)
    return pos, vel


def noise_grids(cfg: SimConfig, seed: int = 0) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CPU-3D-solver style random MAC grids (Simulation3D.cpp:44-71).

    Returns (u, v, w) with shapes (nx+1,ny,nz), (nx,ny+1,nz), (nx,ny,nz+1),
    indexed [x, y, z], filled from a single uniform(-0.25, 0.25) stream in the
    reference's fill order (z-major, then y, then x fastest), U then V then W.
    """
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    n_u = (nx + 1) * ny * nz
    n_v = nx * (ny + 1) * nz
    n_w = nx * ny * (nz + 1)
    s = minstd_uniform_stream(n_u + n_v + n_w, -0.25, 0.25, seed=seed)
    # Reference fills with x fastest, then y, then z -> reshape (nz,ny,nx+1)
    # and transpose to our [x,y,z] convention.
    u = s[:n_u].reshape(nz, ny, nx + 1).transpose(2, 1, 0)
    v = s[n_u : n_u + n_v].reshape(nz, ny + 1, nx).transpose(2, 1, 0)
    w = s[n_u + n_v :].reshape(nz + 1, ny, nx).transpose(2, 1, 0)
    return (np.ascontiguousarray(u), np.ascontiguousarray(v), np.ascontiguousarray(w))
