"""Hash projections (SURVEY.md §2.A #3).

Reference: /root/reference/lib/deduplicator/hash.ex:12-24 — MD5 or SHA-1 over
chunk bytes, raw digest output. The engine standardizes on lowercase hex
(what Spark's md5/sha1/sha2 and the DuckDB oracle produce natively) and adds
sha256 as the scale-safe default: at 100 TB the birthday bound on 128-bit MD5
is fine (~2^64 chunks needed) but SHA-256 removes adversarial-collision risk
for content-addressed storage.

All of these are built-in JVM expressions inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALGORITHMS = ("md5", "sha", "sha1", "sha256")


def content_hash(col: Column | str, algorithm: str = "md5") -> Column:
    """Lowercase-hex content hash of a string/binary column."""
    c = F.col(col) if isinstance(col, str) else col
    if algorithm == "md5":
        return F.md5(c)
    if algorithm in ("sha", "sha1"):  # reference default is SHA-1 (hash.ex:15)
        return F.sha1(c)
    if algorithm == "sha256":
        return F.sha2(c, 256)
    raise ValueError(f"unknown algorithm {algorithm!r}; expected {ALGORITHMS}")
