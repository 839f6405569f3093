"""Property-based tests (hypothesis): codec roundtrip, normalization
invariants, arrival-order independence of the oracle (SURVEY §5.2 item 4)."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from engine.codec import decode_page, encode_page
from tests import oracle

text_lines = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x6FF
        ),
        max_size=30,
    ),
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(
    st.fixed_dictionaries(
        {
            "page_kind": st.sampled_from(["janzour", "massara", "idcard", "blank"]),
            "title_text": st.text(max_size=40),
            "body_text": st.text(max_size=200),
            "has_qr": st.booleans(),
            "conf": st.floats(0, 1, allow_nan=False),
        }
    ),
    st.integers(0, 5000),
)
def test_codec_roundtrip(page, pad):
    assert decode_page(encode_page(page, pad_to=pad)) == page


@settings(max_examples=200, deadline=None)
@given(text_lines)
def test_normalize_stable_after_second_pass(lines):
    """W1 dedup runs on RAW predecessors (reference-faithful,
    pdf_processor.py:555-566), so dropping empty lines can create new
    adjacencies — a single pass is deliberately NOT idempotent
    (['0','','0'] → ['0','0']).  The spec guarantee is: no empties after one
    pass, and a second pass reaches the fixed point."""
    once = oracle.normalize_lines(lines)
    assert "" not in once
    twice = oracle.normalize_lines(once)
    assert oracle.normalize_lines(twice) == twice
    assert all(a != b for a, b in zip(twice, twice[1:]))


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 12))
def test_oracle_order_insensitive_to_arrival(seed, n):
    """Shuffling the span arrival order never changes the oracle output —
    the invariant the Spark pipeline is held to (offset-derived order)."""
    rng = random.Random(seed)
    spans = [
        {"kind": "text", "text": f"line {rng.randint(0, 3)}", "media_ref": None, "offset": i}
        for i in range(n)
    ]
    out1, lin1 = oracle.process_doc(spans, {})
    shuffled = spans[:]
    rng.shuffle(shuffled)
    out2, lin2 = oracle.process_doc(shuffled, {})
    assert out1 == out2 and lin1 == lin2
