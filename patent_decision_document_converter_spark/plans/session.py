"""Session-level helpers shared by the bench / contract harnesses.

Nothing here changes query semantics — these are logging/ergonomics knobs
for the sessions that drive audited workloads.
"""
from __future__ import annotations

from pyspark.sql import SparkSession

#: Loggers whose WARN output is pure noise for *audited* global windows.
#:
#: Every ``Window.orderBy(...)`` without a partition spec in this package
#: sits over a frame already bounded by ``limit(k)`` or a few-hundred-row
#: aggregate (see the "Audited global window" comments at each site:
#: operators/similarity.py top-k rankers, operators/corpus.py
#: token-batch range offsets).  The WindowExec "No Partition Defined"
#: warning is correct in general but noise there, and it CANNOT be
#: silenced at the plan level on Spark 4: ``EliminateWindowPartitions``
#: constant-folds any literal partition key (``partitionBy(lit(0))``)
#: back to an empty partition spec, and non-nullable ``col * 0`` tricks
#: fold too.  So the harness sessions turn that one logger down to ERROR
#: — library code never does this, keeping the warning live for real
#: unpartitioned-window mistakes in user plans.
_WINDOWEXEC_LOGGER = "org.apache.spark.sql.execution.window.WindowExec"


def silence_windowexec_warning(spark: SparkSession) -> None:
    """Turn the WindowExec 'No Partition Defined' WARN down to ERROR.

    Targeted (one logger, not the root level) and best-effort: if the
    JVM's log4j2 Configurator is unavailable the call is a no-op rather
    than a failure.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            _WINDOWEXEC_LOGGER,
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
