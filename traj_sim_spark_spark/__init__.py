"""traj_sim_spark_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
InitialDLab/traj-sim-spark (the DFT framework for distributed trajectory
similarity search, PVLDB 10(11):1478-1489), re-expressed idiomatically on
Spark 4 DataFrames / SQL / Structured Streaming, and extended with the
relational, vector-similarity, text/dedup, and streaming operator surface a
large-scale (100 TB) training-data pipeline needs.

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, Arrow on)
- ``tables``     : table registry — explicit schemas, parquet loaders, views
- ``registry``   : query registry mapping SURVEY.md §2.2 keys to
                   (DataFrame builder, DuckDB oracle SQL)
- ``operators/`` : relational + similarity + trajectory + text operators
- ``functions/`` : scalar/vector column expressions and NumPy DP kernels
- ``sources/``   : readers/sinks beyond the default parquet scan
- ``plans/``     : plan-inspection helpers (pushdown/broadcast assertions)
- ``streaming/`` : Structured Streaming queries + batch-equivalence harness
"""

__version__ = "0.1.0"
