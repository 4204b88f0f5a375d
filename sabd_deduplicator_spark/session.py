"""SparkSession builder used by tests and bench.

The driver supplies its own session to ``__spark_entry__``; queries therefore
never call this module — it exists so local runs get the same tuned config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sabd-dedup-spark") -> SparkSession:
    """local[$SPARK_GRAFT_CPUS] session with AQE + Arrow enabled.

    Settings chosen for scale posture (they all carry to a real cluster):
    - AQE on: runtime shuffle coalescing + skew-join splitting (duplicated
      content makes chunk-hash distributions skewed by construction).
    - shuffle.partitions = 2x cores locally; on a 1000-executor cluster this
      would be sized to ~128MB per post-shuffle partition — AQE coalesces down.
    - Arrow for any pandas interchange (toPandas / pandas UDF paths).
    """
    import tempfile

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # adversarial-determinism probes (PERF.md): odd partition counts and AQE
    # off must not change any oracle-checked value
    shuffle_parts = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(int(cpus), 8))
    )
    aqe = "false" if os.environ.get("SPARK_GRAFT_AQE", "1") in ("0", "false") else "true"
    builder = (
        SparkSession.builder.appName(app_name)
        # keep the metastore warehouse out of the repo cwd (saveAsTable)
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="spark-wh-"))
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UDTFs eval via Arrow batches (ArrowEvalPythonUDTF), not row pickling
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    return builder.getOrCreate()
