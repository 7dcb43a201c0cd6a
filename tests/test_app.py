"""App-layer tests: guarded step, scan driver, debug renderers, PPM IO,
and the CLI demo end-to-end (tiny config)."""

import os
import subprocess
import sys

import numpy as np

from fluidsimulation_tpu.core.config import SimConfig
from fluidsimulation_tpu.core.state import init_state
from fluidsimulation_tpu.render.debug import (
    checkerboard,
    splat_particles_2d,
    splat_particles_3d,
)
from fluidsimulation_tpu.solver.step3d import simulate, step_guarded, step_jit
from fluidsimulation_tpu.app.demo import write_ppm

CFG = SimConfig(nx=16, ny=16, nz=16, cells_per_meter=16.0)


def test_step_guarded_healthy():
    state = init_state(CFG)
    out, ok = step_guarded(state, 0.01, CFG)
    assert bool(ok)
    # Poison the state -> unhealthy flag.
    import jax.numpy as jnp

    bad = init_state(CFG)
    bad.vel = np.asarray(bad.vel).copy()
    bad.vel[0, 0] = np.inf
    out, ok = step_guarded(bad, 0.01, CFG)
    assert not bool(ok)


def test_simulate_scan_equals_loop():
    state = init_state(CFG)
    a = simulate(state, 0.01, CFG, 3)
    b = state
    for _ in range(3):
        b = step_jit(b, 0.01, CFG)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)


def test_debug_renderers():
    state = init_state(CFG)
    bg = checkerboard(64, 48)
    assert bg.shape == (48, 64, 3)
    img2 = np.asarray(splat_particles_2d(np.asarray(state.pos)[:, :2], 64, 48))
    img3 = np.asarray(splat_particles_3d(np.asarray(state.pos), 64, 48))
    for img in (img2, img3):
        assert img.shape == (48, 64, 3)
        assert np.isfinite(img).all()
        assert not np.allclose(img, np.asarray(bg))  # particles visible


def test_write_ppm(tmp_path):
    img = np.random.default_rng(0).random((12, 10, 3)).astype(np.float32)
    path = str(tmp_path / "f.ppm")
    write_ppm(path, img)
    data = open(path, "rb").read()
    assert data.startswith(b"P6\n10 12\n255\n")
    assert len(data) == len(b"P6\n10 12\n255\n") + 12 * 10 * 3


def test_demo_cli(tmp_path):
    """End-to-end CLI: 3 steps at 16^3 with a rendered frame."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", FST_FORCE_CPU="1")
    out = subprocess.run(
        [
            sys.executable, "-m", "fluidsimulation_tpu.app.demo",
            "--grid", "16", "--steps", "3", "--render-every", "2",
            "--width", "64", "--height", "48", "--out", str(tmp_path),
            "--save-state",
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "frame_00000.ppm").exists()
    assert (tmp_path / "final_state.npz").exists()
