"""Pallas VMEM-resident SOR kernel vs the XLA formulation (interpret mode
on CPU; the same kernel compiles natively on TPU up to ~48^3)."""

import numpy as np

import jax
import jax.numpy as jnp

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.ops import levelset, pallas_sor, project
from fluidsimulation_tpu.solver.step3d import step_jit

CFG = SimConfig(nx=16, ny=16, nz=16, cells_per_meter=16.0)


def test_pallas_sor_matches_xla():
    state = step_jit(init_state(CFG), 0.01, CFG)
    phi, _ = levelset.compute_level_set(CFG, state.pos)
    diag = project.compute_diag(CFG, phi)
    b = project.compute_rhs(CFG, state.u, state.v, state.w, jnp.float32(0.01))
    p_xla = project.sor_pressure(CFG, phi, diag, b, use_pallas=False)
    p_pl = pallas_sor.sor_pressure_pallas(CFG, phi, diag, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(p_pl), np.asarray(p_xla), rtol=1e-5, atol=1e-6
    )
