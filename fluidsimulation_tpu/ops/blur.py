"""Cosmetic pre-render level-set blur (gpBlur.hlsl).

7-point (self + 6 neighbors)/7 smoothing.  The reference runs this in place
and tolerates the read/write race ("intentionally race-tolerant",
SURVEY.md §5.2); the functional Jacobi form here is the race-free equivalent.
HLSL out-of-bounds reads are 0, so edge cells average zeros in — replicated
with zero padding.
"""

from __future__ import annotations

from .common import shift


def blur_phi(phi):
    acc = phi
    for axis in range(3):
        for s in (-1, 1):
            acc = acc + shift(phi, axis, s, 0.0)
    return acc / 7.0
