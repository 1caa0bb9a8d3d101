"""Composite operators built from DataFrame primitives.

Each module implements one family of large-scale training-data
operators (SURVEY Phase 6) as pure Spark dataflows — no Python UDFs in
any hot path; everything is hash/shuffle/aggregate on JVM built-ins.
"""
