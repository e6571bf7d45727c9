"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship officeAction conversion over sf0.001.
``queries()``/``oracle_sql()`` — implemented operator demos from
SURVEY.md §2 plus the training-data pipeline suite (dedup / similarity /
text analysis); definitions live in
``patent_decision_document_converter_spark/plans/contract.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from patent_decision_document_converter_spark.plans import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full officeAction conversion (fused 23-step pipeline
    + typo findings) over the sf0.001 documents table."""
    return contract.convert_office_action(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
