"""TPU-gated Pallas kernel regression tests (VERDICT r1 weak #6).

The CPU suite exercises every Pallas kernel in interpret mode only, so a
Mosaic compile/runtime regression would otherwise surface first in bench.
These tests compile and run each kernel natively; they skip unless the
backend is a real TPU (the normal CPU suite skips them all).

Run on TPU with:  JAX_PLATFORMS='' python -m pytest tests/test_tpu_kernels.py
(conftest.py forces CPU for the rest of the suite; this module re-checks the
actual backend at runtime.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)

CFG = SimConfig(nx=16, ny=16, nz=16, cells_per_meter=16.0)


@pytest.fixture(scope="module")
def table_state():
    from fluidsimulation_tpu.ops.celltable import build_cell_table

    state = init_state(CFG)
    table = build_cell_table(CFG, state.pos, state.vel)
    return state, table


@requires_tpu
def test_tpu_pallas_p2g(table_state):
    from fluidsimulation_tpu.ops import celltable as ct
    from fluidsimulation_tpu.ops.pallas_p2g import p2g_from_table_pallas

    state, table = table_state
    got = p2g_from_table_pallas(CFG, table, state.pos, state.vel)
    want = ct.p2g_from_table(CFG, table, state.pos, state.vel)
    for g, w in zip(got[:3], want[:3]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


@requires_tpu
def test_tpu_pallas_seed_and_sweep(table_state):
    from fluidsimulation_tpu.ops import celltable as ct
    from fluidsimulation_tpu.ops import levelset
    from fluidsimulation_tpu.ops.pallas_seed import neighborhood_pass_pallas
    from fluidsimulation_tpu.ops.pallas_sweep import sweep_closest_pallas

    state, table = table_state
    phi0, cpos0 = ct.seed_closest_from_table(CFG, table, levelset.FAR)
    got_phi, got_cpos = neighborhood_pass_pallas(CFG, cpos0)
    want_phi, want_cpos = levelset.neighborhood_pass(CFG, cpos0)
    np.testing.assert_allclose(np.asarray(got_phi), np.asarray(want_phi), atol=1e-5)

    got_sw, _ = sweep_closest_pallas(CFG, got_phi, got_cpos)
    want_sw, _ = levelset.sweep_closest(CFG, want_phi, want_cpos)
    np.testing.assert_allclose(np.asarray(got_sw), np.asarray(want_sw), atol=1e-5)


@requires_tpu
def test_tpu_pallas_sor():
    from fluidsimulation_tpu.ops import levelset, project
    from fluidsimulation_tpu.ops.pallas_sor import sor_pressure_pallas
    from fluidsimulation_tpu.solver.step3d import step_jit

    state = step_jit(init_state(CFG), 0.01, CFG)
    phi, _ = levelset.compute_level_set(CFG, state.pos)
    diag = project.compute_diag(CFG, phi)
    b = project.compute_rhs(CFG, state.u, state.v, state.w, jnp.float32(0.01))
    got = sor_pressure_pallas(CFG, phi, diag, b, interpret=False)
    want = project.sor_pressure(CFG, phi, diag, b, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@requires_tpu
def test_tpu_fused_step_runs():
    """The full fast step (all Pallas kernels wired) compiles and stays
    finite on the native backend."""
    from fluidsimulation_tpu.solver.step3d import step_jit

    state = init_state(CFG)
    for _ in range(3):
        state = step_jit(state, 0.01, CFG)
    assert np.isfinite(np.asarray(state.vel)).all()
    assert np.isfinite(np.asarray(state.pos)).all()


@requires_tpu
def test_tpu_pallas_p2g_super():
    from fluidsimulation_tpu.ops import supertable as st
    from fluidsimulation_tpu.ops.pallas_p2g_super import p2g_from_super_pallas

    cfg = SimConfig(nx=16, ny=16, nz=16, cells_per_meter=16.0,
                    particles_per_cell_axis=1)
    state = init_state(cfg)
    table = st.build_super_table(cfg, state.pos, state.vel)
    got = p2g_from_super_pallas(cfg, table, state.pos, state.vel)
    want = st.p2g_from_super(cfg, table, state.pos, state.vel)
    for i in range(3):
        valid = np.asarray(want[3 + i])
        np.testing.assert_array_equal(np.asarray(got[3 + i]), valid)
        np.testing.assert_allclose(
            np.asarray(got[i])[valid], np.asarray(want[i])[valid],
            rtol=2e-4, atol=2e-4,
        )


@requires_tpu
def test_tpu_pallas_pairpack():
    from fluidsimulation_tpu.core.pallas_pairpack import (
        pack_mac3_pair_pallas,
        pack_mac3_pair_padded,
    )

    rng = np.random.default_rng(11)
    nx = ny = nz = 16
    shapes = ((nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1))
    ga = tuple(jnp.asarray(rng.normal(size=s).astype(np.float32))
               for s in shapes)
    gb = tuple(jnp.asarray(rng.normal(size=s).astype(np.float32))
               for s in shapes)
    ref = pack_mac3_pair_padded(ga, gb)
    ker = pack_mac3_pair_pallas(ga, gb)
    for r, k in zip(ref, ker):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(k))


@requires_tpu
def test_tpu_pallas_p2g_super_zblocked():
    """Round 5: the multi-z-block kernel form (the 256^3 enabler) on a
    tiny anisotropic grid — nz=256 pushes Ks*nz past the flagship Mosaic
    budget so the kernel takes the z-blocked path (nzb=2) on real Mosaic,
    where the CPU suite only exercises it in interpret mode."""
    from fluidsimulation_tpu.ops import supertable as st
    from fluidsimulation_tpu.ops.pallas_p2g_super import (
        p2g_from_super_pallas,
        super_p2g_fits,
    )

    cfg = SimConfig(nx=8, ny=16, nz=256, cells_per_meter=256.0,
                    particles_per_cell_axis=1)
    assert super_p2g_fits(cfg) and st.super_k(cfg) * cfg.nz > 8 * 128
    state = init_state(cfg)
    table = st.build_super_table(cfg, state.pos, state.vel)
    got = p2g_from_super_pallas(cfg, table, state.pos, state.vel)
    want = st.p2g_from_super(cfg, table, state.pos, state.vel)
    for i in range(3):
        valid = np.asarray(want[3 + i])
        np.testing.assert_array_equal(np.asarray(got[3 + i]), valid)
        np.testing.assert_allclose(
            np.asarray(got[i])[valid], np.asarray(want[i])[valid],
            rtol=2e-4, atol=2e-4,
        )
