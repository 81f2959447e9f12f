"""PySpark-native GDPR anonymization & data-pipeline engine.

A from-scratch re-design (NOT a port) of the capabilities of
tabodino/dbt-gdpr-anonymizer: column-level privacy policy declared as data
drives a runtime DataFrame rewriter that applies masking as native Catalyst
``Column`` expressions — no Python UDFs anywhere in the parity surface, so
every plan stays inside whole-stage codegen and scales to cluster data sizes.

Layout:
    config      — engine settings (salt, k, gps precision) from env
    session     — SparkSession factory tuned for local[...] and cluster use
    policy      — the metadata control plane (ColumnPolicy, mask_model)
    functions/  — masking + text Column-expression libraries
    plans/      — the 4-layer pipeline (staging → anonymized → enriched → mart)
    operators/  — validation, reporting, dedup, similarity, multimodal
    sources/    — ingest (JSONL/CSV/parquet readers, flattening)
    streaming/  — Structured Streaming anonymization
"""

__version__ = "1.0.0"
