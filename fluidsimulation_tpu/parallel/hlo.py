"""Compiled-HLO collective counting: regression pins for the engineered
communication budgets.

The halo step's collective counts (docs/PARALLEL.md: 84 permute / 14 AG /
20 a2a / 0 AR at 32³/D=8 vs GSPMD's 447 / 56+ / 347 / 29) were verified by
hand in round 3; these helpers let tests assert them so a refactor that
silently falls back to GSPMD all-to-alls fails CI (VERDICT r3 item 5).

Counting convention: every HLO token of a collective family counts — the
async `-start`/`-done` forms count as separate tokens, matching how the
docs/PARALLEL.md table was measured (scripts/diag_mesh_work.py raw-token
form).  Counts are per compiled TEXT, so a permute inside a `while` body
counts once however many iterations execute.
"""

from __future__ import annotations

import collections
import re

FAMILIES = (
    "collective-permute",
    "all-gather",
    "all-reduce",
    "all-to-all",
    "reduce-scatter",
)

_TOKEN = re.compile(
    r"(" + "|".join(FAMILIES) + r")[-.\w]*"
)


def collective_counts(compiled_text: str) -> dict[str, int]:
    """Token counts per collective family in compiled HLO text."""
    c = collections.Counter(
        m.group(1) for m in _TOKEN.finditer(compiled_text)
    )
    return {name: c.get(name, 0) for name in FAMILIES}


def compiled_collectives(fn, *args) -> dict[str, int]:
    """Compile ``fn`` for ``args`` and count its collectives."""
    import jax

    return collective_counts(jax.jit(fn).lower(*args).compile().as_text())
