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


def test_decode_one_never_raises_on_fuzz():
    """X3 failure isolation at the decode boundary: ARBITRARY bytes (both
    payload magics, truncations, junk) must produce a decode_error dict —
    never an exception escaping into the task."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from engine.layout import _decode_one

    @settings(max_examples=300, deadline=None)
    @given(
        st.one_of(
            st.none(),
            st.binary(max_size=64),
            st.binary(min_size=4, max_size=256).map(lambda b: b"SPG1" + b),
            st.binary(min_size=4, max_size=256).map(lambda b: b"SPB1" + b),
        )
    )
    def run(blob):
        out = _decode_one(blob)
        assert isinstance(out, dict)
        assert "decode_error" in out
        if out["decode_error"] is None:
            assert out["body_lines"] is not None

    run()


def test_decode_one_roundtrips_both_magics():
    from engine import bitmap, codec
    from engine.layout import _decode_one

    spg = _decode_one(
        codec.encode_page({"page_kind": "massara", "body_text": "x", "regions": []})
    )
    assert spg["decode_error"] is None and spg["body_lines"] == ["x"]
    spb = _decode_one(
        bitmap.encode_bitmap_page({"page_kind": "massara", "body_lines": ["y"]})
    )
    assert spb["decode_error"] is None and spb["body_lines"] == ["y"]
    assert set(spg) == set(spb)  # one PAGE_FEATURES contract, two codecs


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 1_000_000), st.integers(0, 1_000_000))
def test_lm_quantized_pair_cost_nonnegative_within_bound(c1, c2):
    """lm_perplexity's per-pair cost a_w − c_w must be ≥ 0 whenever the
    bigram count can't exceed its first-word unigram count (c2 ≤ c1) and
    the reference sample stays under the documented ~4e7-per-bucket bound —
    the integer-quantization analogue of ln P(w|prev) ≤ 0.  (Beyond the
    bound the two independent round() calls can produce a stray −1, which
    is why the engine docstring states the bound instead of claiming the
    invariant universally.)"""
    import math

    if c2 > c1:
        c1, c2 = c2, c1  # enforce the model's structural constraint
    B, SCALE = 4096, 10_000
    a_w = round(SCALE * math.log(c1 + B))
    c_w = round(SCALE * math.log(c2 + 1))
    assert a_w - c_w >= 0


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.integers(0, 2**62), st.text(max_size=24)))
def test_dsir_gumbel_uniform_is_type_agnostic_and_finite(doc_id):
    """The DSIR resample key's uniform is md5 of the STRING id (so string
    and numeric doc_ids both get real keys — the numeric-Knuth form
    silently NULLed on strings), stays inside int64, and the Gumbel term
    is finite: u can never reach 0 or 1 because of the +0.5 half-bucket
    offset over an exact 32-bit hash."""
    import hashlib
    import math

    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    assert 0 <= h < 2**32  # 8 hex chars: exact 32-bit range, no overflow
    u = (h + 0.5) / 2**32
    assert 0.0 < u < 1.0
    g = -math.log(-math.log(u))
    assert math.isfinite(g)
