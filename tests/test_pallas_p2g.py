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


def test_pallas_p2g_overflow_correction_units():
    """Regression: the overflow correction takes positions in CELL units;
    passing meters silently mis-binned overflow contributions (round-3 fix).
    Cram > K particles into one cell so overflow fires, then compare against
    the exact direct P2G."""
    from fluidsimulation_tpu.ops import p2g as direct

    pos, _ = dam_break_particles(CFG)
    u, v, w = noise_grids(CFG, seed=11)
    m = np.array([16, 16, 16], np.float32)
    vel = np.stack(
        solver3d.interp_mac(u, v, w, m[0] * pos[:, 0], m[1] * pos[:, 1], m[2] * pos[:, 2]),
        axis=-1,
    ).astype(np.float32)
    K = ct.default_k(CFG)
    n_extra = 2 * K + 3
    rng = np.random.default_rng(3)
    p = np.asarray(pos).copy()
    p[:n_extra] = (8.0 + rng.uniform(-0.45, 0.45, size=(n_extra, 3))) / 16.0
    p = jnp.asarray(p)
    v2 = jnp.asarray(vel)

    table = ct.build_cell_table(CFG, p, v2)
    assert int(table.n_overflow) > 0
    got = pp.p2g_from_table_pallas(CFG, table, p, v2)
    want = direct.transfer_to_grid(CFG, p, v2)
    for i in range(3):
        valid = np.asarray(want[3 + i])
        np.testing.assert_array_equal(np.asarray(got[3 + i]), valid)
        np.testing.assert_allclose(
            np.asarray(got[i])[valid], np.asarray(want[i])[valid],
            rtol=2e-4, atol=2e-4,
        )


def test_vmem_gate_classifies_measured_cases():
    """The VMEM-fit gate must use padded, double-buffered block sizes
    (ADVICE r2): 128^3 / K=12 fails the scoped-VMEM compile on real TPU and
    must be classified UNFIT; 64^3 / K=12 and 128^3 / K=5 run natively."""
    from fluidsimulation_tpu.core.config import SimConfig

    c128 = SimConfig(nx=128, ny=128, nz=128)
    c64 = SimConfig(nx=64, ny=64, nz=64)
    assert not pp.p2g_fits_vmem(c128, 12)
    assert pp.p2g_fits_vmem(c64, 12)
    assert pp.p2g_fits_vmem(c128, 5)
