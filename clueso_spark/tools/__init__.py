"""Operational CLIs: populator, compactor, storage info.

Python mains mirroring the reference's tools/ (populator, compactor CLI,
storage-info), re-expressed Spark-first: the populator generates rows with
``spark.range`` + Column expressions instead of a driver-side RDD
generator, so it scales to any record count without driver memory.
"""
