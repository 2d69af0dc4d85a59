"""Property-based tests (hypothesis) for the pure text functions and
corpus derivation invariants — no Spark session needed, so they run
fast and explore the input space the fixtures can't."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from renet2_spark.functions.text import split_sentences, tokenize_text

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
texts = st.lists(words, min_size=1, max_size=40).map(" ".join)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_tokenizer_roundtrip_plain_words(t):
    # pure lowercase word text: tokenizer is exactly whitespace split
    assert tokenize_text(t) == t.split()


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_tokenizer_total_and_nonempty(t):
    toks = tokenize_text(t)
    assert all(tok for tok in toks)
    # no token may contain whitespace
    assert all(" " not in tok for tok in toks)


@given(st.lists(st.lists(words, min_size=1, max_size=8), min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_splitter_reconstructs_content(sentences):
    # "Word ... word." sentences with capitalized starts
    rendered = " ".join(s[0].capitalize() + " " + " ".join(s[1:]) + "."
                        if len(s) > 1 else s[0].capitalize() + "."
                        for s in sentences)
    got = split_sentences(rendered)
    # snt_split PARTITIONS the text exactly (reference keeps leading
    # spaces): concatenating the pieces reproduces the input verbatim
    assert "".join(got) == rendered
    # and every emitted sentence ends with the terminator
    assert all(g.endswith(".") for g in got)


@given(st.integers(min_value=0, max_value=10_000),
       st.lists(words, min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_media_rule_and_sentence_math(doc_id, ws):
    """The corpus derivation constants in pure python: sentence count,
    media rule, and offset arithmetic agree with the oracle SQL's
    formulation (mirrors renet2_spark/corpus.py)."""
    n_sent = (len(ws) + 9) // 10
    media = [s for s in range(2, n_sent) if (doc_id + s) % 7 == 0]
    # offsets: sentence s starts after s*10 words joined by spaces
    text = " ".join(ws)
    for s in range(n_sent):
        off = 0 if s == 0 else len(" ".join(ws[: s * 10])) + 1
        sent = " ".join(ws[s * 10 : s * 10 + 10])
        assert text[off : off + len(sent)] == sent
    assert all(2 <= m < n_sent for m in media)


def _scan_model(tags):
    """Reference make_tags phase-2 scan, re-expressed in plain python
    (sequence_utils.py:42-80): overlap (start < running end, exclusive
    ends) REPLACES the previous kept tag with [kept.start, new.end] +
    the NEW identity; running end := each scanned tag's own end."""
    kept = []
    cur_end = None
    for t in sorted(tags):
        if kept and t[0] < cur_end:
            prev = kept.pop()
            kept.append((prev[0],) + t[1:])
        else:
            kept.append(t)
        cur_end = t[1]
    return kept


@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 10), st.text("ab", min_size=1, max_size=3)),
    min_size=1, max_size=12))
@settings(max_examples=25, deadline=None)
def test_merge_overlaps_equals_reference_scan(spark, spans):
    """The window-chain formulation of merge_overlaps must equal the
    reference's sequential scan for ARBITRARY span sets (incl.
    contained spans that shrink the running end and duplicate
    starts)."""
    tags = []
    seen = set()
    for i, (s, ln, name) in enumerate(spans):
        key = (s, s + ln, name)
        if key in seen:  # model sort needs unique tuples for determinism
            continue
        seen.add(key)
        tags.append((s, s + ln, f"m{name}", f"e{name}{i}"))
    rows = [("d", 0, i, s, e, m, "Gene", eid)
            for i, (s, e, m, eid) in enumerate(tags)]
    from renet2_spark.operators.anncleaner import merge_overlaps

    df = spark.createDataFrame(
        rows,
        "doc_id string, sent_no int, tok_no int, start int, end int, "
        "mention string, type string, entity_id string",
    )
    got = {(r["start"], r["end"], r["mention"], r["entity_id"])
           for r in merge_overlaps(df).collect()}
    # model operates on (start, end, mention, type, entity_id, tok_no)
    # sort order; replicate the window's ordering exactly
    ordered = sorted(
        (s, e, m, "Gene", eid, i)
        for i, (s, e, m, eid) in enumerate(tags)
    )
    model_in = [(t[0], t[1], t[2], t[4]) for t in ordered]
    want = set(_scan_model(model_in))
    assert got == want
