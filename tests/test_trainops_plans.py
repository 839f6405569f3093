"""Physical-plan guards for the training-data dedup suite.

Every pairing query must generate candidates via a bounded equi-join —
never an all-pairs nested-loop/cartesian (the textbook 100×-scale killer).
These tests pin that property so a future edit can't silently reintroduce
an inequality-only join condition.
"""

from __future__ import annotations

import os

import pytest

from engine import trainops

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")

_PAIRING_QUERIES = [
    trainops.dedup_minhash_lsh,
    trainops.dedup_ngram_jaccard,
    trainops.dedup_simhash_hamming,
    trainops.dedup_embedding_cosine,
]

_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")


@pytest.mark.parametrize("fn", _PAIRING_QUERIES, ids=lambda f: f.__name__)
def test_pairing_query_has_no_all_pairs_join(spark, fn):
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    for marker in _FORBIDDEN:
        assert marker not in plan, f"{fn.__name__} plan contains {marker}:\n{plan[:2000]}"


def test_hamming_bands_cover_distance_2():
    """Pigeonhole sanity: the 3 bands partition all 16 fingerprint bits, so
    any pair at Hamming distance ≤ 2 shares at least one full band."""
    covered = []
    for shift, width in trainops._HAM_BANDS:
        covered.extend(range(shift, shift + width))
    assert sorted(covered) == list(range(16))
    assert len(trainops._HAM_BANDS) >= 3  # d + 1 bands for d = 2
