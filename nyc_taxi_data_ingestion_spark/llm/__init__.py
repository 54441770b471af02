"""LLM-training-data pipeline operators (the engine's north-star
extensions beyond the reference's surface — BASELINE.json).

All hot paths are JVM-side built-in expressions (higher-order array
functions, xxhash64) — no Python UDFs — so they scale like any other
Catalyst plan. Pandas/Arrow appears only at the multimodal decode
boundary, which is stubbed (no codec libs in this environment) with the
Spark-side plumbing real and tested.
"""
