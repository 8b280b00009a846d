"""etl_job_applify_spark — a PySpark-native analytics/ETL engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo itsrcx/etl-job-applify (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst + AQE,
partition-aware sources/sinks, and scale-oriented extensions (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, Arrow on)
- ``sources``    : parquet/CSV/JSON/XML/ORC/text/binary readers,
                   partitioned JDBC, catalog, custom Python DataSource
                   (JSONL shards, batch + streaming)
- ``sinks``      : parquet/JDBC/CSV/JSON writers, pure-Spark upsert,
                   range- and Z-order-clustered layouts, compaction
- ``transform``  : declarative schema-contract mapper (+ quarantine),
                   dedup, deterministic sampling
- ``operators``  : relational assemblies Spark lacks natively (as-of
                   join, grouped top-k, sessionization, range join,
                   salting, SCD2 intervals + incremental batch apply,
                   connected components, incremental rollup
                   maintenance)
- ``functions``  : scalar/vector helpers (text stats, embedding math,
                   AES-GCM crypto)
- ``dedup``      : exact + MinHash/LSH + SimHash + n-gram Jaccard dedup
- ``similarity`` : brute-force + LSH/IVF ANN (incl. persisted IVF index)
- ``multimodal`` : binary media columns: schema + batched decode
                   plumbing; REAL codecs for PPM images, WAV/PCM audio,
                   and PVS video frame streams
- ``streaming``  : Structured Streaming jobs (windows, stateful ops,
                   stream-stream joins, CDC/SCD2/rollup sinks, anomaly
                   detection, AvailableNow runs)
- ``pipeline``   : lazy E→T*→L composition with observed metrics
- ``jobs``       : declarative job specs (batch + streaming dispatch)
- ``plans``      : explain/plan-inspection helpers
- ``queries``    : the registered query inventory driven by
                   ``__spark_entry__.py`` and cross-checked vs DuckDB
"""

__version__ = "0.1.0"
