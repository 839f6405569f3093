"""Unit tests for incremental MinHash dedup (engine.trainops.dedup_incremental).

Hand-built fixtures with EXACT duplicate texts (identical shingle sets ⇒ all
4 band signatures equal ⇒ guaranteed LSH hit), so every verdict is forced by
construction, independent of hash values:

- corpus: docs 1, 2, 3 (distinct texts)
- batch:  100 = copy of corpus 1            → duplicate_of_corpus, dup_of=1
          101, 102 = copies of each other   → 101 new (component min),
                     (no corpus match)         102 duplicate_in_batch, dup_of=101
          103, 104 = the near-dup CHAIN     → 103 duplicate_of_corpus, dup_of=3
            corpus3 ~ 103 ~ 104               104 duplicate_in_batch, dup_of=3
            (verified band overlaps below)    (corpus transitivity via 103)
          105 = unique                      → new, dup_of null

The chain texts are 4-token docs (2 shingles each) found by exhaustive
search over the REAL band-min hashes: corpus 3 and 103 share exactly 2 of 4
band signatures (corpus hit), 103 and 104 share exactly 2 (in-batch pair),
corpus 3 and 104 share 0 — so 104's duplicate_in_batch verdict can ONLY come
from the component-level corpus transitivity, never a direct probe hit.

Re-search recipe (run whenever trainops.band_mins changes its hash family —
the chain constants are family-specific): over permutations of w0..w11 as
(a..f), A=[a,b,c,d] B=[b,c,d,e] C=[c,d,e,f]; band sig i = min over the
doc's distinct shingles of md5(('01:' if i<2 else '23:')+shingle) hex
slice [0:16] (even bands) / [16:32] (odd); pick the first with overlaps
(A,B)=2, (B,C)=2, (A,C)=0.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from engine.trainops import (
    curate_incremental,
    dedup_incremental,
    minhash_signatures,
    updated_signature_index,
)

T_A = "alpha beta gamma delta epsilon zeta"
T_B = "one two three four five six seven"
T_C = "red orange yellow green blue indigo"
T_D = "lorem ipsum dolor sit amet consectetur"
T_E = "north south east west up down sideways"
# search-verified chain (see module docstring): band overlaps 2 / 2 / 0
# under the CURRENT hash family (r5-close: two md5 digests split into two
# 64-bit slices each — re-search these whenever band_mins changes; the
# search script is reproduced in the module docstring's recipe below)
T_CHAIN_CORPUS = "w0 w1 w2 w6"
T_CHAIN_MID = "w1 w2 w6 w4"
T_CHAIN_END = "w2 w6 w4 w11"


def _docs(spark, rows):
    return spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in rows], "doc_id: long, text: string"
    )


def _corpus_and_batch(spark):
    corpus = _docs(spark, [(1, T_A), (2, T_B), (3, T_CHAIN_CORPUS)])
    batch = _docs(
        spark,
        [
            (100, T_A),
            (101, T_C),
            (102, T_C),
            (103, T_CHAIN_MID),
            (104, T_CHAIN_END),
            (105, T_D),
        ],
    )
    return minhash_signatures(corpus), batch


def test_verdicts_cover_every_case(spark):
    corpus_sigs, batch = _corpus_and_batch(spark)
    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in dedup_incremental(corpus_sigs, batch).collect()
    }
    assert got == {
        100: ("duplicate_of_corpus", 1),
        101: ("new", None),
        102: ("duplicate_in_batch", 101),
        103: ("duplicate_of_corpus", 3),
        104: ("duplicate_in_batch", 3),  # corpus transitivity through 103
        105: ("new", None),
    }


def test_kept_set_is_pairwise_band_distinct(spark):
    """Invariant: after the batch is filtered to `new` docs and appended,
    no two indexed docs share >= 2 band signatures — the state the NEXT
    nightly run relies on."""
    corpus_sigs, batch = _corpus_and_batch(spark)
    verdicts = dedup_incremental(corpus_sigs, batch)
    idx = updated_signature_index(
        corpus_sigs, minhash_signatures(batch), verdicts
    )
    a, b = idx.alias("a"), idx.alias("b")
    offenders = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy("a.doc_id", "b.doc_id")
        .count()
        .filter(F.col("count") >= 2)
        .count()
    )
    assert offenders == 0


def test_state_carry_across_two_batches(spark):
    """A doc kept as `new` in batch 1 must catch its own duplicate arriving
    in batch 2 — the whole point of carrying the signature index forward."""
    corpus_sigs, batch1 = _corpus_and_batch(spark)
    v1 = dedup_incremental(corpus_sigs, batch1)
    idx1 = updated_signature_index(corpus_sigs, minhash_signatures(batch1), v1)
    batch2 = _docs(spark, [(200, T_C), (201, T_E)])  # T_C was kept as doc 101
    got = {
        r["doc_id"]: (r["verdict"], r["dup_of"])
        for r in dedup_incremental(idx1, batch2).collect()
    }
    assert got == {
        200: ("duplicate_of_corpus", 101),
        201: ("new", None),
    }


def test_curate_incremental_outcomes_and_precedence(spark):
    """Full delta-curation chain under the DEFAULT thresholds.  The Gopher
    top-bigram>5% rule flags any all-distinct doc shorter than 21 words, so
    this fixture uses 30-word texts (top bigram 1/29 ≈ 3.4%) — exact copies
    still guarantee LSH hits (identical shingle sets ⇒ identical band sigs).
    Precedence: quality fires before repetition (106 is both short AND
    spammy → dropped_quality), repetition fires before dedup (107 is both
    spammy AND an exact corpus duplicate → dropped_repetition)."""
    long_a = " ".join(f"a{i}" for i in range(30))
    long_c = " ".join(f"c{i}" for i in range(30))
    long_d = " ".join(f"d{i}" for i in range(30))
    spam = " ".join(["spam"] * 30)
    corpus_sigs = minhash_signatures(
        _docs(spark, [(1, long_a), (2, spam)])
    )
    batch = spark.createDataFrame(
        [
            {"doc_id": 100, "source": "s", "text": long_a},
            {"doc_id": 101, "source": "s", "text": long_c},
            {"doc_id": 102, "source": "s", "text": long_c},
            {"doc_id": 105, "source": "s", "text": long_d},
            {"doc_id": 106, "source": "s", "text": "spam spam"},
            {"doc_id": 107, "source": "s", "text": spam},
        ],
        "doc_id: long, source: string, text: string",
    )
    got = {
        r["doc_id"]: (r["outcome"], r["dup_of"])
        for r in curate_incremental(corpus_sigs, batch).collect()
    }
    assert got == {
        100: ("dropped_duplicate_corpus", 1),
        101: ("kept", None),
        102: ("dropped_duplicate_batch", 101),
        105: ("kept", None),
        106: ("dropped_quality", None),
        107: ("dropped_repetition", None),
    }


def test_incremental_plan_has_no_all_pairs_join(spark):
    """Same guard as the other pairing queries: both the corpus probe and
    the within-batch pairing must be equi-joins, never nested-loop."""
    corpus_sigs, batch = _corpus_and_batch(spark)
    plan = (
        dedup_incremental(corpus_sigs, batch)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"plan contains {marker}:\n{plan[:2000]}"


def test_stale_hash_family_index_fails_loud(spark):
    """A persisted index written under a DIFFERENT band_mins hash family
    (e.g. the pre-r5-close 32-hex 'i:'-prefix md5 sigs) must raise, not
    silently verdict every true duplicate as 'new' (probe join matches
    nothing across families)."""
    import pytest

    stale = spark.createDataFrame(
        [{"doc_id": 1, "band": 0, "sig": "0" * 32}],
        "doc_id: long, band: int, sig: string",
    )
    batch = _docs(spark, [(100, T_A)])
    with pytest.raises(Exception, match="hash-family mismatch"):
        dedup_incremental(stale, batch).collect()
