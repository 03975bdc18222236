"""Staging area for gate-complete operator candidates awaiting a driver
certification-window slot.

Used when the driver's 50-slot correctness window is already full (the
r11 drain): candidates are built to the full gate standard here (exact
DuckDB oracle, multi-sf parity tests, scale notes) WITHOUT registering,
so they cost zero window slots until promoted. The six r11-staged ops
were promoted into their family modules at round 12; r13.py holds the
next wave (matrix profile, exact 2-feature Shapley, mergeable moment
rollup), staged because the r13 window is already owed to the 36
deferred r12-extension ops.
"""
