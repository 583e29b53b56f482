"""Column-level function library (all JVM-side Catalyst expressions).

Everything here returns ``pyspark.sql.Column`` built from built-in
functions — no Python UDFs — so the hot path stays inside whole-stage
codegen at any scale.
"""
