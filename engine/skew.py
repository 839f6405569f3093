"""Skew & partitioning policy (SURVEY.md §4 custom-physical-work item 1).

The corpus has a skewed tail of docs with one oversized media span (payload
100-1000× median, FIXTURES.md §1), and at 10^12 scale pathological documents
with millions of spans can exist.  Where each hazard is handled:

- **oversized payload bytes**: consumed at the blobs SCAN (pipeline decodes
  via mapInArrow before any exchange), so per-partition byte skew is bounded
  by ``spark.sql.files.maxPartitionBytes`` — no salting needed there;
- **mega-document re-nest skew**: ``assemble.reassemble(salt_partials=N)``
  uses :func:`salt_col` for a two-phase salted aggregation, bounding rows per
  reducer key;
- **runtime residue**: AQE (`skewJoin`, `coalescePartitions`) re-splits /
  merges — enabled in engine.session;
- :func:`spread` remains for inputs whose file layout correlates with row
  cost (deterministic salt — resume-safe, unlike rand());
- at real-cluster scale, bucketing both Iceberg tables by ``media_ref`` makes
  the features join shuffle-free (PLANS.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salt: int, *cols: Column | str) -> Column:
    """Deterministic salt in [0, n_salt): pmod(hash(cols), n_salt)."""
    return F.pmod(F.hash(*cols), F.lit(n_salt))


def spread(df: DataFrame, n_parts: int, *cols: str) -> DataFrame:
    """Repartition by a deterministic salt over ``cols`` to scatter oversized
    rows, breaking any correlation between input file order and payload size.

    The salt domain is 16× the partition count: hashing a salt whose domain
    equals n_parts balls-in-bins ~1/3 of the partitions empty and others
    doubled; a wide domain keeps partition sizes within a few percent.
    """
    salted = df.withColumn("__salt", salt_col(n_parts * 16, *cols))
    return salted.repartition(n_parts, "__salt").drop("__salt")
