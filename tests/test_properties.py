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
