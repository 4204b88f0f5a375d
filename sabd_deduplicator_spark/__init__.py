"""sabd_deduplicator_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ShapovalovaIrina/SABD-Deduplicator.

The reference (/root/reference, Elixir/OTP + Postgres) implements
content-addressed chunk-level file deduplication: chunk -> hash -> first
occurrence index -> encoded output, plus relational reporting queries over the
index. This package re-expresses every one of those capabilities — and the
LLM-data-pipeline extensions (near-dup, similarity search, text analysis,
multimodal columns) — as idiomatic Spark DataFrame plans so Catalyst/Tungsten
pick the physical strategy and everything scales horizontally.

Layout:
    session.py     SparkSession builder (AQE on, tuned for local[32] testing)
    catalog.py     loaders for the driver's parquet tables
    schemas.py     StructTypes for the dedup data model (files/chunks/hash_links)
    registry.py    query registry consumed by __spark_entry__.py
    operators/     dedup family, chunker, encode/recover, relational breadth
    functions/     scalar/array helpers (hashing, vector math, text metrics)
    sources/       readers (parquet/binary/jsonl) incl. multimodal plumbing
    streaming/     Structured Streaming twins of the stateful dedup fold
    plans/         plan-inspection helpers (.explain capture, shuffle count)
"""

__version__ = "0.1.0"
