"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``engine`` package; queries are registered in
engine/relational.py (SURVEY.md §2 operators), engine/trainops.py
(dedup / similarity / text-analysis), and engine/entry.py (extraction
pipeline over driver tables).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import engine.relational as _relational  # noqa: E402  (registers queries)
import engine.trainops as _trainops  # noqa: E402,F401  (registers queries)
import engine.multimodal as _multimodal  # noqa: E402,F401  (registers queries)
import engine.entry as _entry  # noqa: E402,F401  (registers queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (text + media branches) over an
    interleaved corpus synthesized from /root/testdata/sf0.001 documents."""
    return _entry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.build for q in _relational.registry()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.sql for q in _relational.registry() if q.sql is not None}
