"""seisdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Liang-Ding/seisdb, re-expressed Spark-first.

The reference (/root/reference) is a single-node numpy batch pipeline that
reduces SPECFEM3D wavefield snapshots into a compressed Green's-function
database.  This package re-expresses every one of its dataflow operators
(SURVEY.md §2) as declarative DataFrame transformations so Catalyst/AQE pick
the physical strategy, and extends the surface with the relational +
LLM-data-pipeline operators the reference lacks (dedup, similarity search,
text analysis, multimodal columns, streaming).

Layout:
    session.py    SparkSession builder tuned for the target workload
    schemas.py    explicit schemas + reference constants (INDEX27, L=8)
    sources/      parquet table loaders, SPECFEM Fortran-binary decode
    pipeline/     end-to-end SGT/DGF build + decode (the reference's job)
    functions/    text / similarity / dedup / multimodal expression library
    streaming/    Structured Streaming variants (events + snapshot ingest)
    queries/      driver-facing query registry with DuckDB oracle SQL twins
"""

__version__ = "0.1.0"
