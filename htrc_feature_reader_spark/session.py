"""SparkSession builder tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
same conf block is what we'd ship to ``spark-submit`` on a real cluster —
AQE on (runtime re-plan + skew-join splitting), Arrow on (every pandas UDF
crosses via Arrow batches), shuffle partitions sized to parallelism rather
than the 200 default, UTC session timezone so timestamp semantics match the
DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _ship_package(sc) -> None:
    """Ship this package to executor Python workers — the in-process
    equivalent of ``spark-submit --py-files`` (scripts/submit.sh does the
    same for cluster runs). UDF closures reference package functions, which
    cloudpickle serializes BY MODULE REFERENCE, so the worker must be able
    to ``import htrc_feature_reader_spark`` no matter what directory the
    driver ran from (a driver that did ``sys.path.insert`` does not
    propagate that path to workers)."""
    if getattr(sc, "_htrc_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"htrc_feature_reader_spark_pyfiles_{os.getuid()}.zip"
    )
    tmp = zpath + f".{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    os.replace(tmp, zpath)  # atomic: concurrent sessions never see a partial zip
    sc.addPyFile(zpath)
    sc._htrc_pkg_shipped = True


def get_spark(
    app_name: str = "htrc-feature-reader-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard conf.

    ``cores`` pins ``local[N]`` explicitly — used by the two-parallelism
    scaling benchmark (BASELINE.md protocol: N vs 4N cores on identical
    input). Shuffle partitions default to 2x cores: enough tasks for AQE to
    coalesce, few enough to avoid tiny-task overhead at local scale. On a
    real cluster AQE re-sizes these at runtime anyway.
    """
    n = cores if cores is not None else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuf = shuffle_partitions if shuffle_partitions is not None else max(2 * n, 8)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuf))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first coalescing (the default): never coalesce below
        # the core count — size-based coalescing (parallelismFirst=false)
        # folds mid-size shuffles into a handful of fat, spilling partitions
        # and starves the cluster (measured: 5x regression at 32 cores)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark.sparkContext)
    return spark
