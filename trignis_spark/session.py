"""SparkSession construction with scale-oriented defaults.

The engine never *requires* these settings — every operator works on a
vanilla session (the correctness driver supplies its own) — but tests and
bench use this builder so local runs exercise the same AQE/shuffle
configuration we would deploy on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "trignis-spark",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults.

    - AQE on: runtime coalescing + skew-join handling stand in for the
      hand-tuning a 1000-executor cluster would otherwise need.
    - shuffle.partitions sized to the local core count; on a real
      cluster this is overridden (or left to AQE's initialPartitionNum).
    - UTC session timezone so timestamp semantics match the DuckDB
      oracle and are cluster-location independent.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
    )
    # Scale-dependent knob, parameterised rather than constant (round
    # 12, guide §2.2): AQE's advisory post-shuffle partition size
    # should track input scale (~100 MB–1 GB partitions on a cluster),
    # not the 64 MB default tuned for neither. UNSET by default so
    # every driver-run bench keeps the exact prior configuration; the
    # sf1/sf10 local legs and cluster deployments set
    # SPARK_GRAFT_ADVISORY_MB explicitly (production sizing rationale
    # in OPTIMIZATION_r12.md).
    adv_mb = os.environ.get("SPARK_GRAFT_ADVISORY_MB")
    if adv_mb:
        builder = builder.config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(int(adv_mb) * 1024 * 1024),
        )
    builder = (
        builder
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
