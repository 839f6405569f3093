"""Exhaustive / randomized Spark-vs-oracle equivalence, batched into single
Spark jobs (SURVEY §5.2 item 4 strengthened).

- routing: the ENTIRE router input space — every subset of the four routing
  labels × every title class × QR on/off — must route identically in the
  Catalyst when-chain and the oracle cascade (160 combinations, exhaustive);
- normalization: 400 adversarial random strings (seeded) through the Spark
  regex chain and the oracle's list pipeline.
"""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F

from engine.codec import encode_page
from engine.layout import decode_media
from engine.routing import route
from engine import textops
from tests import oracle

LABELS = ["doc_title", "paragraph_title", "header", "table"]
TITLES = [
    "",
    "كشف تفاصيل الخدمات",
    "إيصال رقم 55",
    "أدوية ومستلزمات من الايواء",
    "ورقة خروج",
]


def test_router_exhaustive_equivalence(spark):
    pages = []
    for r in range(len(LABELS) + 1):
        for subset in itertools.combinations(LABELS, r):
            for title in TITLES:
                for qr in (False, True):
                    pages.append(
                        {
                            "page_kind": "x",
                            "regions": [{"label": l, "bbox": [0, 0, 1, 1]} for l in subset],
                            "title_text": title,
                            "body_text": "line",
                            "has_qr": qr,
                            "qr_rotated": False,
                            "boilerplate": [],
                            "conf": 0.5,
                        }
                    )
    assert len(pages) == 160
    df = spark.createDataFrame(
        [(i, encode_page(p)) for i, p in enumerate(pages)], "i: int, payload: binary"
    )
    feats = df.select("i", decode_media(F.col("payload")).alias("feats"))
    mode, skip = route(F.col("feats"))
    got = {
        r["i"]: (r["m"], r["s"])
        for r in feats.select("i", mode.alias("m"), skip.alias("s")).collect()
    }
    for i, page in enumerate(pages):
        assert got[i] == oracle.route_page(page), f"combo {i}: {page}"


def _random_text(rng: random.Random) -> str:
    pieces = []
    words = ["a", "bb", "ccc", "الاجمالي", "net", "x", "", " ", "*"]
    for _ in range(rng.randint(0, 8)):
        line = " ".join(rng.choice(words) for _ in range(rng.randint(0, 6)))
        if rng.random() < 0.3:
            line += rng.choice(["   ", "\t", " ‎", "‏"])
        pieces.append(line)
        if rng.random() < 0.25:
            pieces.append(line)  # duplicate line
    return "\n".join(pieces)


def test_normalize_randomized_equivalence(spark):
    rng = random.Random(4242)
    texts = [_random_text(rng) for _ in range(400)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i: int, s: string")
    got = {
        r["i"]: r["v"]
        for r in df.select(
            "i", textops.normalize_span_text(F.col("s")).alias("v")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == oracle.normalize_text(t), f"text {i!r}: {t!r}"
