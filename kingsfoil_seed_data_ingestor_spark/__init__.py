"""kingsfoil_seed_data_ingestor_spark — a PySpark-native analytics engine.

A from-scratch Spark DataFrame/SQL rebuild of the capabilities of
``jacobkp/kingsfoil_seed_data_ingestor`` (a FastAPI + pandas + PostgreSQL
ingestion pipeline for CMS healthcare reference data), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns, streaming) designed for 100 TB scale.

Layout:
    session      — SparkSession builder tuned for local[N] and cluster use
    registry     — declarative source metadata (schemas, synonyms, keys)
    functions/   — typed transform Column expressions (sentinel semantics)
    sources/     — all-string file readers (CSV/TXT sniffing, Excel)
    operators/   — header detection, dedup family, similarity, text analysis
    plans/       — the query layer (views, analytical queries)
    streaming/   — structured-streaming event pipelines
    versioning   — version state machine over parquet meta tables
    ingest       — end-to-end ingest orchestration
"""

__version__ = "0.1.0"
