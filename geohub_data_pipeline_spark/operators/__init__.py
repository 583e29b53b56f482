"""Composite operators built from DataFrame primitives.

Each module implements one operator family the engine adds on top of
stock Spark: as-of joins, near-duplicate detection, similarity search,
tiling/raster pyramids, progress accounting, audits, geometry kernels,
multimodal column plumbing.
"""
