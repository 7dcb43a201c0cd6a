"""Measured-negative engineering experiments, quarantined from the product
tree (VERDICT r4 item 9).  Everything here is functional and equality-tested
but lost its A/B against the shipped path; kept as the engineering record
with its tests.

- wavefront: global ray-pool exact renderer (round 3) — loses to the
  scan-tiled renderer's whole-tile early exits on every measured scene
  (docs/PERF.md round 3: 540-780 vs 400-407 ms at 128^3).
"""
