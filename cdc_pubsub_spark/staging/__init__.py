"""Staged r12 operator candidates — implemented and parity-tested, NOT
registered.

Round 11 froze the registry at 378 and filled the driver's 50-slot
correctness window EXACTLY (2 recertifies + 47 never-sampled + 1 stale
backfill, completing the certification drain) — registering anything
new this round would displace a never-sampled op and leave the drain
incomplete. These candidates are therefore built to the full gate
standard now (exact DuckDB oracle, sf0.001/sf0.01 parity tests, scale
notes) and held OUT of ``cdc_pubsub_spark.all_queries``; promoting one
in r12 is a single ``register(...)`` decorator plus a
``_RECERTIFY``-era window slot.
"""
