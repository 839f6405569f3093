"""Skew & partitioning policy (SURVEY.md §4 custom-physical-work item 1).

The corpus has a skewed tail of docs with one oversized media span (payload
100-1000× median, FIXTURES.md §1).  The join key (``media_ref``) is unique per
span, so there is no *key* skew — the hazard is *bytes-per-partition* skew: a
hash partition that happens to land several giant blobs OOMs or straggles.

Policy:
- spread the media branch across ``n_parts`` partitions by a salt derived from
  ``(doc_id, offset)`` — deterministic (resume-safe, unlike rand()) yet
  decorrelated from the input file layout, so giant blobs scatter;
- AQE (`skewJoin`, `coalescePartitions`) re-splits/merges at runtime — enabled
  in engine.session;
- at real-cluster scale, bucketed/Iceberg-partitioned storage on
  ``bucket(media_ref)`` would make the blobs join shuffle-free on the blob
  side; documented here because local parquet has no bucketing metadata.
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
