"""Checkpoint / resume.

The reference has no checkpointing (reset-to-initial only) but exposes all
state for debugging via TSV export/import (debugroutines.h:24-151) — state is
fully externalizable as {particles(pos,vel), U, V, W, Phi} (SURVEY.md §5.4).
Here that tuple is first-class: ``save_state``/``load_state`` round-trip a
SimState through a single .npz (the golden-data format for tests, replacing
TSV), and TSV import/export is kept for byte-level debugging parity.
"""

from __future__ import annotations

import numpy as np

from ..core.config import SimConfig
from ..core.state import SimState

_FIELDS = ("pos", "vel", "u", "v", "w", "phi")


def save_state(path: str, state: SimState, cfg: SimConfig | None = None) -> None:
    arrays = {k: np.asarray(getattr(state, k)) for k in _FIELDS}
    if cfg is not None:
        arrays["_cfg"] = np.array(
            [cfg.nx, cfg.ny, cfg.nz, cfg.cells_per_meter], np.float64
        )
    np.savez_compressed(path, **arrays)


def load_state(path: str, cfg: SimConfig | None = None) -> SimState:
    """Load a SimState; pass ``cfg`` to assert the checkpoint's recorded grid
    config matches (a mismatched resume would silently hand step() arrays
    inconsistent with its static cfg)."""
    with np.load(path) as z:
        state = SimState(**{k: z[k] for k in _FIELDS})
        if cfg is not None:
            if "_cfg" in z:
                stored = tuple(z["_cfg"])
                want = (cfg.nx, cfg.ny, cfg.nz, cfg.cells_per_meter)
                if stored != tuple(float(x) for x in want):
                    raise ValueError(
                        f"checkpoint cfg {stored} != requested {want}"
                    )
            if state.phi.shape != cfg.grid_shape():
                raise ValueError(
                    f"checkpoint phi shape {state.phi.shape} != "
                    f"cfg grid {cfg.grid_shape()}"
                )
    return state


# -- TSV debug IO (debugroutines.h parity) ----------------------------------

def export_array_tsv(path: str, arr: np.ndarray) -> None:
    """Grid export: one z-slice block per section, rows = y, cols = x
    (debugroutines.h:24 exportArray writes tab-separated values)."""
    arr = np.asarray(arr)
    with open(path, "w") as f:
        if arr.ndim == 2:
            arr = arr[:, :, None]
        for z in range(arr.shape[2]):
            for y in range(arr.shape[1]):
                f.write("\t".join(repr(float(v)) for v in arr[:, y, z]))
                f.write("\n")
            f.write("\n")


def import_array_tsv(path: str, shape: tuple[int, ...]) -> np.ndarray:
    vals = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                vals.extend(float(t) for t in line.split("\t"))
    nx = shape[0]
    ny = shape[1]
    nz = shape[2] if len(shape) > 2 else 1
    a = np.array(vals, np.float32).reshape(nz, ny, nx).transpose(2, 1, 0)
    return a if len(shape) > 2 else a[:, :, 0]


def export_particles_tsv(path: str, pos: np.ndarray, vel: np.ndarray) -> None:
    """Particle export (debugroutines.h:165 exportParticles)."""
    with open(path, "w") as f:
        for p, v in zip(np.asarray(pos), np.asarray(vel)):
            f.write("\t".join(repr(float(x)) for x in (*p, *v)) + "\n")


def l2_norm_diff(a: np.ndarray, b: np.ndarray) -> float:
    """ComputeL2Norm (debugroutines.h:153): cross-implementation diffing."""
    return float(np.sqrt(((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).sum()))


# -- APIC extension family ---------------------------------------------------

_APIC_FIELDS = ("pos", "vel", "C", "u", "v", "w", "phi")


def save_apic_state(path: str, state, cfg: SimConfig | None = None) -> None:
    """save_state for solver/apic.py::ApicState (adds the C rows)."""
    arrays = {k: np.asarray(getattr(state, k)) for k in _APIC_FIELDS}
    if cfg is not None:
        arrays["_cfg"] = np.array(
            [cfg.nx, cfg.ny, cfg.nz, cfg.cells_per_meter], np.float64
        )
    np.savez_compressed(path, **arrays)


def load_apic_state(path: str, cfg: SimConfig | None = None):
    from ..solver.apic import ApicState

    with np.load(path) as z:
        state = ApicState(**{k: z[k] for k in _APIC_FIELDS})
        if cfg is not None:
            if "_cfg" in z:
                stored = tuple(z["_cfg"])
                want = (cfg.nx, cfg.ny, cfg.nz, cfg.cells_per_meter)
                if stored != tuple(float(x) for x in want):
                    raise ValueError(
                        f"checkpoint cfg {stored} != requested {want}"
                    )
            if state.phi.shape != cfg.grid_shape():
                raise ValueError(
                    f"checkpoint phi shape {state.phi.shape} != "
                    f"cfg grid {cfg.grid_shape()}"
                )
    return state
