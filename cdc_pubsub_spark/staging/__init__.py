"""Staging area for gate-complete operator candidates awaiting a driver
certification-window slot.

Used when the driver's 50-slot correctness window is already full (the
r11 drain): candidates are built to the full gate standard here (exact
DuckDB oracle, multi-sf parity tests, scale notes) WITHOUT registering,
so they cost zero window slots until promoted. The six r11-staged ops
were promoted into their family modules at round 12; the three r12-
staged ops (matrix profile, exact 2-feature Shapley, mergeable moment
rollup) were promoted at round 13. Currently empty.
"""
