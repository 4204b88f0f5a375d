"""Registered multimodal queries (plumbing from sources/multimodal.py).

`media_feature_extract` exercises the Arrow/mapInPandas path (rows-only check:
byte-level features over BLOBs aren't expressible in portable SQL);
`multimodal_metadata_stats` proves the metadata columns behave as ordinary
relational data (full oracle parity) — filters on typed metadata prune the
parquet scan without touching payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sabd_deduplicator_spark.registry import query
from sabd_deduplicator_spark.sources.multimodal import (
    extract_media_features,
    synthesize_media_blobs,
)


@query("media_feature_extract")  # binary feature extraction → rows-only check
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_media_features(synthesize_media_blobs(spark, sf_dir))


@query(
    "multimodal_metadata_stats",
    oracle=(
        # mirrors synthesize_media_blobs' deterministic derivation
        "SELECT media_type, count(*) AS n, "
        "CAST(sum(n_bytes) AS BIGINT) AS total_bytes, "
        "CAST(max(meta_width) AS INT) AS max_width "
        "FROM ("
        "  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
        "         ELSE 'video' END AS media_type, "
        "         octet_length(encode(text)) AS n_bytes, "
        "         CAST(n_chars % 640 AS INT) AS meta_width "
        "  FROM documents"
        ") GROUP BY media_type"
    ),
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = synthesize_media_blobs(spark, sf_dir)
    return blobs.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max("meta_width").alias("max_width"),
    )
