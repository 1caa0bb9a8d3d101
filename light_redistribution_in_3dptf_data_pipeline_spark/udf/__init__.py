"""Vectorized UDF stages (SURVEY §2.9) — Arrow-batched pandas UDFs,
``applyInPandas`` groups, and the driver-loop optimizer pattern."""
