"""adfs_spark — a PySpark-native metadata-analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of taobao/ADFS (reference read at /root/reference) on top
of the Spark DataFrame/SQL stack:

- ``schema``    — declarative table specs (the reference's @Table/@Column/@Index
                  annotation model, DistributedDataRepositoryBaseOnTable.java:684-763).
- ``catalog``   — load parquet tables into DataFrames / temp views.
- ``storage``   — versioned tables with tombstone deletes + change log
                  (version semantics of DistributedDataRepositoryBaseOnTable.java:316-330).
- ``operators`` — the full §2 operator inventory of SURVEY.md as pure
                  DataFrame→DataFrame functions (find/joins/aggregates/windows/
                  hierarchy/delta/reconcile).
- ``functions`` — scalar helpers plus the large-scale pipeline extensions
                  (text analysis, dedup, similarity search, multimodal).
- ``streaming`` — Structured Streaming veneer for the reference's
                  heartbeat/lease/report loops.

Everything here is built from the public PySpark API only; the modules
cite reference files (file:line) purely to document behavioral parity.
"""

__version__ = "0.1.0"
