"""geotile — PySpark-native spatial-join + tiling engine.

Brand-new engine with the query capabilities of freeeyes/geohash
(reference at /root/reference, C++), re-expressed Spark-first:
DataFrame/SQL plans, vectorized numpy kernels behind Arrow-batched
pandas UDFs, partition-pruned cell joins, and an Iceberg-style
manifest layer for resumable pipelines.
"""

__version__ = "0.1.0"
