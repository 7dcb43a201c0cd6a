"""Pallas P2G tile kernel vs the XLA cell-table path (interpret mode).

The kernel IS wired into the default fast step on single-chip TPU
(solver/step3d.py::use_pallas_kernels); the CPU suite locks down its
semantics in interpret mode, and tests/test_tpu_kernels.py compile-smokes
the Mosaic path when a real TPU is present.
"""

import numpy as np

import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.seeding import dam_break_particles, noise_grids
from fluidsimulation_tpu.ops import celltable as ct
from fluidsimulation_tpu.ops import pallas_p2g as pp
from fluidsimulation_tpu.reference import solver3d

CFG = SimConfig(nx=16, ny=16, nz=16, cells_per_meter=16.0)


def test_pallas_p2g_matches_xla_interpret():
    pos, _ = dam_break_particles(CFG)
    u, v, w = noise_grids(CFG, seed=7)
    m = np.array([16, 16, 16], np.float32)
    vel = np.stack(
        solver3d.interp_mac(u, v, w, m[0] * pos[:, 0], m[1] * pos[:, 1], m[2] * pos[:, 2]),
        axis=-1,
    ).astype(np.float32)
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    table = ct.build_cell_table(CFG, pos, vel)
    a = ct.p2g_from_table(CFG, table, pos, vel)
    b = pp.p2g_from_table_pallas(CFG, table, pos, vel)
    for i in range(3):
        valid = np.asarray(a[3 + i])
        np.testing.assert_array_equal(valid, np.asarray(b[3 + i]))
        np.testing.assert_allclose(
            np.asarray(a[i])[valid], np.asarray(b[i])[valid], atol=1e-5
        )


def test_fused27_matches_per_component():
    pos, _ = dam_break_particles(CFG)
    vel = jnp.zeros_like(jnp.asarray(pos)) + 0.5
    pos = jnp.asarray(pos)
    table = ct.build_cell_table(CFG, pos, vel)
    a = ct.p2g_from_table(CFG, table, pos, vel)
    b = ct.p2g_from_table_fused(CFG, table, pos, vel)
    for i in range(3):
        valid = np.asarray(a[3 + i])
        np.testing.assert_array_equal(valid, np.asarray(b[3 + i]))
        np.testing.assert_allclose(
            np.asarray(a[i])[valid], np.asarray(b[i])[valid], atol=1e-5
        )
