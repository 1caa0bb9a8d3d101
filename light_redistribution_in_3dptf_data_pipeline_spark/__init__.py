"""light_redistribution_in_3dptf_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (light redistribution in 3D-printed
translucent fixtures): relational operators over a star schema, sequence /
session analytics, geometry dataflows, vectorized UDF stages, and
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Design principles (see SURVEY.md):
- DataFrame/SQL first; Catalyst + AQE do the physical planning.
- Exact-arithmetic discipline for oracle parity: aggregate money/measure
  columns as DECIMAL (exact), convert to DOUBLE only at the end.
- UDFs only where built-ins cannot express the semantics, always
  Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas).
"""

__version__ = "0.1.0"
