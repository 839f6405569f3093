"""Iceberg MERGE semantics, simulated on DuckDB against the io.py resume
fixtures (VERDICT r4 #6).

No iceberg-spark-runtime jar exists in this sandbox, so
engine.iceberg.merge_docs_sql can parse (tests/test_iceberg_sql.py) but never
execute.  The remaining runtime risk is SEMANTIC: does the doc-level MERGE
upsert actually produce the same table state as the local materialize_run
resume discipline it replaces at scale?  This file pins that equivalence by
executing the MERGE's matched/not-matched rules on an independent engine:

    MERGE INTO spans_out t USING src s ON t.doc_id = s.doc_id
    WHEN MATCHED      THEN UPDATE SET t.spans_out = s.spans_out,
                                      t.run_id   = s.run_id
    WHEN NOT MATCHED  THEN INSERT *

desugars (per the Iceberg/Spark spec: each target row joins at most one
source row; matched rows update, unmatched source rows insert) into exactly

    UPDATE t SET ... FROM s WHERE t.doc_id = s.doc_id;
    INSERT INTO t SELECT ... FROM s WHERE NOT EXISTS (...);

which DuckDB 1.0 executes natively.  Rows are compared by (doc_id, run_id,
span-sequence fingerprint) — the fingerprint is computed ONCE on the Spark
side and carried opaquely through DuckDB, so the comparison is about MERGE
row outcomes, never about cross-engine span serialization.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from engine.io import materialize_run
from engine.pipeline import run_extraction
from engine.schema import MEDIA_BLOBS_SCHEMA, SPANS_SCHEMA


def _fp_rows(df, run_id):
    """(doc_id, fp, run_id) — span-sequence fingerprint per doc.  to_json of
    the ordered spans_out array is deterministic for a fixed session."""
    return [
        (r["doc_id"], r["fp"], run_id)
        for r in df.select(
            "doc_id", F.md5(F.to_json(F.col("spans_out"))).alias("fp")
        ).collect()
    ]


def _merge(con, src_rows):
    """Execute the merge_docs_sql semantics on DuckDB: matched → update
    spans fingerprint + run_id; not matched → insert."""
    con.execute("CREATE OR REPLACE TABLE src (doc_id TEXT, fp TEXT, run_id TEXT)")
    con.executemany("INSERT INTO src VALUES (?, ?, ?)", src_rows)
    con.execute(
        """
        UPDATE target SET fp = src.fp, run_id = src.run_id
        FROM src WHERE target.doc_id = src.doc_id
        """
    )
    con.execute(
        """
        INSERT INTO target
        SELECT s.doc_id, s.fp, s.run_id FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.doc_id = s.doc_id)
        """
    )


def _target_state(con):
    return {
        r[0]: (r[1], r[2])
        for r in con.sql("SELECT doc_id, fp, run_id FROM target").fetchall()
    }


def test_merge_sequence_reproduces_resume_union(spark, corpus, tmp_path):
    """Scenario 1 — resume-as-MERGE: materialize_run r1 (30 docs) then r2
    (resume over the full input → only the 30 new docs), each run's OWN
    spans_out MERGEd into an Iceberg-like target in commit order, must leave
    the target identical to the union-of-runs frame io.py returns: every doc
    exactly once, attributed to the run that extracted it."""
    spans_rows, blob_rows = corpus
    blobs = spark.createDataFrame(blob_rows, MEDIA_BLOBS_SCHEMA)
    out = str(tmp_path / "run")

    spans1 = spark.createDataFrame(spans_rows[:30], SPANS_SCHEMA)
    materialize_run(spark, spans1, blobs, out, run_id="r1")
    spans_all = spark.createDataFrame(spans_rows[:60], SPANS_SCHEMA)
    union = materialize_run(spark, spans_all, blobs, out, run_id="r2")

    con = duckdb.connect()
    con.execute("CREATE TABLE target (doc_id TEXT, fp TEXT, run_id TEXT)")
    for rid in ("r1", "r2"):
        per_run = spark.read.parquet(f"{out}/spans_out/run={rid}")
        _merge(con, _fp_rows(per_run, rid))

    got = _target_state(con)
    run_of = {
        rid: {r["doc_id"] for r in
              spark.read.parquet(f"{out}/spans_out/run={rid}").collect()}
        for rid in ("r1", "r2")
    }
    expected = {
        doc_id: (fp, "r1" if doc_id in run_of["r1"] else "r2")
        for doc_id, fp, _ in _fp_rows(union["spans_out"], "")
    }
    assert got == expected
    # runs are disjoint (the resume anti-join), so the MERGEs were pure
    # inserts: no doc appears twice and both runs contributed
    assert len(got) == 60
    assert run_of["r1"].isdisjoint(run_of["r2"])
    assert run_of["r1"] and run_of["r2"]

    # Scenario 2 — re-extraction upsert ("detector fix"): docs 10-40 are
    # re-extracted under r3 and MERGEd.  Matched rows must flip to r3's
    # fingerprint+run_id IN PLACE (no duplicate row), untouched docs must
    # keep their original attribution, and nothing inserts (every source doc
    # already exists).
    re_spans = spark.createDataFrame(spans_rows[10:40], SPANS_SCHEMA)
    re_out = run_extraction(spark, re_spans, blobs, run_id="r3").spans_out
    src3 = _fp_rows(re_out, "r3")
    before = _target_state(con)
    _merge(con, src3)
    after = _target_state(con)

    assert len(after) == len(before) == 60
    re_docs = {d for d, _, _ in src3}
    assert len(re_docs) == 30
    for doc_id, fp, rid in src3:
        assert after[doc_id] == (fp, "r3")
    for doc_id in set(before) - re_docs:
        assert after[doc_id] == before[doc_id]
    # the re-extracted content is identical (same docs, same detector here),
    # so only attribution changed — content-stability is itself an outcome
    # worth pinning: a MERGE must never corrupt the span sequence
    for doc_id, fp, _ in src3:
        assert before[doc_id][0] == fp
    con.close()


def test_media_groups_merge_refresh_is_idempotent_upsert(spark):
    """refresh_media_groups_sql semantics on DuckDB (same desugaring as the
    doc MERGE above): re-running a nightly media-dedup pass after the corpus
    grew must UPDATE every ref present in the new verdicts (group sizes and
    canonicals shift), INSERT new refs, and leave refs absent from the pass
    untouched — and running the same pass twice must be a no-op."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from engine.trainops import media_dedup_exact

    schema = StructType(
        [
            StructField("media_ref", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def verdicts(rows):
        df = media_dedup_exact(spark.createDataFrame(rows, schema))
        return [
            (r["media_ref"], r["n_refs"], r["canonical_ref"], r["is_boilerplate"])
            for r in df.collect()
        ]

    day1 = [("r1", b"\x01logo"), ("r2", b"\x01logo"), ("r9", b"\x07old")]
    # day 2 re-scans a GROWN corpus slice: the logo group crosses the
    # boilerplate threshold and r9 is absent from the pass (untouched)
    day2 = [
        ("r1", b"\x01logo"),
        ("r2", b"\x01logo"),
        ("r3", b"\x01logo"),
        ("r4", b"\x02stamp"),
    ]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE media_groups (media_ref TEXT, n_refs BIGINT,"
        " canonical_ref TEXT, is_boilerplate BOOLEAN)"
    )

    def merge(rows):
        con.execute(
            "CREATE OR REPLACE TABLE src (media_ref TEXT, n_refs BIGINT,"
            " canonical_ref TEXT, is_boilerplate BOOLEAN)"
        )
        con.executemany("INSERT INTO src VALUES (?, ?, ?, ?)", rows)
        con.execute(
            """
            UPDATE media_groups SET n_refs = src.n_refs,
                   canonical_ref = src.canonical_ref,
                   is_boilerplate = src.is_boilerplate
            FROM src WHERE media_groups.media_ref = src.media_ref
            """
        )
        con.execute(
            """
            INSERT INTO media_groups SELECT s.* FROM src s
            WHERE NOT EXISTS (SELECT 1 FROM media_groups t
                              WHERE t.media_ref = s.media_ref)
            """
        )

    def state():
        return {
            r[0]: r[1:]
            for r in con.sql(
                "SELECT media_ref, n_refs, canonical_ref, is_boilerplate"
                " FROM media_groups"
            ).fetchall()
        }

    merge(verdicts(day1))
    assert state()["r1"] == (2, "r1", False)
    merge(verdicts(day2))
    got = state()
    assert set(got) == {"r1", "r2", "r3", "r4", "r9"}
    for r in ("r1", "r2", "r3"):
        assert got[r] == (3, "r1", True)  # group grew across the threshold
    assert got["r4"] == (1, "r4", False)
    assert got["r9"] == (1, "r9", False)  # absent from the pass → untouched
    merge(verdicts(day2))  # idempotent re-run
    assert state() == got
