"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo
``syedaemanali/Near-Real-Time-Data-Warehouse-Prototype-for-METRO-Shopping-Store-in-Pakistan``.

The reference (read-only at /root/reference) is a single-JVM Java
MESHJOIN ETL feeding a MySQL star schema plus a 10-query OLAP workload
(SQL/OLAP Queries - Metro.sql). This package re-expresses those
semantics Spark-first:

- ``sources``   — typed readers for the reference CSV contracts and the
                  driver-provided TPC-H-ish parquet testdata.
- ``functions`` — scalar derivations (time dimension attrs, text
                  analysis, vector math) as built-in-function
                  compositions (JVM-side, codegen-friendly).
- ``operators`` — batch ETL (the MESHJOIN-equivalent stream-static
                  join + idempotent upsert), dedup family (exact,
                  MinHash-LSH, SimHash, n-gram Jaccard), similarity
                  search, quality scoring.
- ``plans``     — the star-schema mapping over the testdata and the
                  Q1-Q10 OLAP workload as DataFrame builders with
                  ANSI-SQL oracles.
- ``streaming`` — Structured Streaming ETL (readStream -> foreachBatch
                  idempotent upsert), the reference's Main.java
                  producer/consumer pipeline re-expressed.
"""

__version__ = "0.1.0"
