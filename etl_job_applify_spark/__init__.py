"""etl_job_applify_spark — a PySpark-native analytics/ETL engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo itsrcx/etl-job-applify (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst + AQE,
partition-aware sources/sinks, and scale-oriented extensions (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, Arrow on)
- ``sources``    : parquet/CSV/JSON/XML readers, partitioned JDBC, catalog
- ``sinks``      : parquet/JDBC writers, pure-Spark upsert
- ``transform``  : declarative schema-contract mapper, dedup
- ``operators``  : relational assemblies Spark lacks natively
                   (as-of join, grouped top-k, sessionization, range join)
- ``functions``  : scalar/vector helpers (text stats, embedding math)
- ``dedup``      : exact + MinHash/LSH + SimHash + n-gram Jaccard dedup
- ``similarity`` : brute-force + LSH/IVF approximate nearest neighbors
- ``multimodal`` : binary media columns: schema + batched decode plumbing
- ``streaming``  : Structured Streaming jobs (tumbling/sliding/session)
- ``queries``    : the registered query inventory driven by
                   ``__spark_entry__.py`` and cross-checked vs DuckDB
"""

__version__ = "0.1.0"
