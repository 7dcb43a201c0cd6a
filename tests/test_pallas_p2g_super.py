"""Pallas supercell P2G tile kernel vs the XLA supertable path (interpret
mode on CPU; tests/test_tpu_kernels.py compile-smokes Mosaic on real TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.seeding import dam_break_particles, noise_grids
from fluidsimulation_tpu.ops import p2g as direct
from fluidsimulation_tpu.ops import pallas_p2g_super as pps
from fluidsimulation_tpu.ops import supertable as st
from fluidsimulation_tpu.reference import solver3d

CFG = SimConfig(nx=16, ny=16, nz=16, cells_per_meter=16.0,
                particles_per_cell_axis=1)


def _seeded(seed=7, cram=0):
    pos, _ = dam_break_particles(CFG)
    u, v, w = noise_grids(CFG, seed=seed)
    m = np.array([16, 16, 16], np.float32)
    p = np.asarray(pos).copy()
    if cram:
        rng = np.random.default_rng(5)
        p[:cram] = (8.0 + rng.uniform(-0.45, 0.45, size=(cram, 3))) / 16.0
    vel = np.stack(
        solver3d.interp_mac(u, v, w, m[0] * p[:, 0], m[1] * p[:, 1], m[2] * p[:, 2]),
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(p), jnp.asarray(vel)


def _check(got, want):
    for i in range(3):
        valid = np.asarray(want[3 + i])
        np.testing.assert_array_equal(np.asarray(got[3 + i]), valid)
        np.testing.assert_allclose(
            np.asarray(got[i])[valid], np.asarray(want[i])[valid],
            rtol=2e-4, atol=2e-4,
        )


def test_pallas_super_p2g_matches_direct_interpret():
    pos, vel = _seeded()
    table = st.build_super_table(CFG, pos, vel)
    got = pps.p2g_from_super_pallas(CFG, table, pos, vel)
    _check(got, direct.transfer_to_grid(CFG, pos, vel))


@pytest.mark.slow  # round 5: 25 s; the matches_direct + overflow
# interpret tests keep the fast kernel signal (z-blocking only
# activates at 256^3 on TPU)
def test_pallas_super_p2g_zblocked_bitexact_interpret():
    """Round-5 z-blocking (the 256^3 enabler): per-z-block accumulation is
    the identical window arithmetic over a lane slice — reductions never
    run over z, so the blocked kernel must match the unblocked one
    BIT-FOR-BIT (here zB = nz/2 stands in for the 128-lane blocks real
    grids use)."""
    pos, vel = _seeded(seed=11)
    table = st.build_super_table(CFG, pos, vel)
    base = pps.p2g_accumulate_pallas_super(CFG, table.slots)
    blk = pps.p2g_accumulate_pallas_super(CFG, table.slots,
                                          zblock=CFG.nz // 2)
    for grp_a, grp_b in zip(base, blk):
        for a, b in zip(grp_a, grp_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_super_p2g_overflow_interpret():
    Ks = st.super_k(CFG)
    pos, vel = _seeded(seed=9, cram=3 * Ks)
    table = st.build_super_table(CFG, pos, vel)
    assert int(table.n_overflow) > 0
    got = pps.p2g_from_super_pallas(CFG, table, pos, vel)
    _check(got, direct.transfer_to_grid(CFG, pos, vel))


@pytest.mark.slow  # round 5: 41 s; multi-tile arithmetic soak
def test_pallas_super_p2g_batched_multi_ytile():
    """Both kernel forms on an anisotropic grid whose supercell y extent
    spans TWO ty=8 tiles (exercises the j>0 / sy0-offset arithmetic the
    cube fixture never reaches).  Agreement is ~1 ulp, not bit-exact: the
    batched form's Ks reduction runs over a 5-D stacked tensor whose
    reduce tree the backend shapes differently (see kernel docstring)."""
    cfg = SimConfig(nx=16, ny=32, nz=16, cells_per_meter=16.0,
                    particles_per_cell_axis=1)
    pos, _ = dam_break_particles(cfg)
    u, v, w = noise_grids(cfg, seed=3)
    m = np.array([16, 32, 16], np.float32)
    p = np.asarray(pos)
    vel = jnp.asarray(np.stack(
        solver3d.interp_mac(u, v, w, m[0] * p[:, 0], m[1] * p[:, 1],
                            m[2] * p[:, 2]), axis=-1).astype(np.float32))
    table = st.build_super_table(cfg, pos, vel)
    a0, m0 = pps.p2g_accumulate_pallas_super(cfg, table.slots, batched=False)
    a1, m1 = pps.p2g_accumulate_pallas_super(cfg, table.slots, batched=True)
    for x, y in zip(a0 + m0, a1 + m1):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=3e-7, atol=3e-7
        )
    # The VMEM-fallback chunked forms accumulate in the identical per-slot
    # order; interpret mode reproduces chunk 16 exactly.
    for ch in (8, 4):
        ac, mc = pps.p2g_accumulate_pallas_super(
            cfg, table.slots, batched=True, combo_chunk=ch
        )
        for x, y in zip(a1 + m1, ac + mc):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
