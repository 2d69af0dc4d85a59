"""Raw-text scalar functions: tokenizer + sentence splitter.

Re-expressions (NOT ports) of the reference's text preprocessing:

* :func:`tokenize_text` — rule-based biomedical tokenizer with the
  same rule *classes* as the reference's ~50 ordered replace rules
  (src/renet2/utils/tokenizer.py:16-110): punctuation spacing,
  English clitic splitting ('s, n't, 're, ...), sentence-final
  period splitting that protects abbreviations and decimals.
* :func:`split_sentences` — sentence splitter with bracket balancing
  and abbreviation protection (reference src/renet2/raw.py:399-586
  `snt_split`/`sentence_split`/`refine_snt`; production reference
  path shells out to the GENIA C++/Ruby splitter,
  src/renet2/parse_data.py:456-467 — replaced here by a
  deterministic pure function that doubles as the test oracle).

Both are pure python string functions applied via vectorized pandas
UDFs (Arrow batches) — the synthetic corpus doesn't need them (it is
pre-tokenized word salad), but raw-text ingest does, and unit tests
pin their semantics.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# clitics split off as separate tokens (reference tokenizer.py rule
# class: "'s" / "n't" / "'re" etc. get surrounding spaces)
_CLITICS = ("'s", "n't", "'re", "'ve", "'ll", "'d", "'m")

# punctuation always split into its own token
_PUNCT = r"()[]{}<>,;:!?\"/\\|@#$%^&*=+~"

# abbreviations whose trailing period does NOT end a sentence
# (reference raw.py:437-545 protects ' vs', 'i.e', 'e.g', ' al',
# ' Dr', ' ref', ' viz')
_ABBREV = ("vs", "i.e", "e.g", "al", "Dr", "ref", "viz", "Fig", "cf")


def tokenize_text(text: str) -> list[str]:
    """Deterministic rule tokenizer.

    Rules, in order (mirroring the reference's rule classes):
    1. isolate punctuation chars in _PUNCT
    2. split clitics into separate tokens
    3. split a final '.' off a token unless the remainder is an
       abbreviation or the token is a decimal number
    4. whitespace-split
    """
    s = text
    for ch in _PUNCT:
        s = s.replace(ch, f" {ch} ")
    for cl in _CLITICS:
        s = re.sub(f"(?i)(?<=\\w)({re.escape(cl)})(?=\\s|$)", r" \1", s)
    out: list[str] = []
    for tok in s.split():
        dots = 0
        while tok.endswith(".") and len(tok) > 1 and tok[:-1] not in _ABBREV:
            tok = tok[:-1]
            dots += 1
        out.append(tok)
        out.extend(["."] * dots)
    return [t for t in out if t]


def split_sentences(text: str) -> list[str]:
    """Sentence splitter with bracket balancing + abbreviation rules.

    A '.', '!' or '?' ends a sentence iff (a) all brackets opened so
    far are closed, (b) the token before it is not a protected
    abbreviation, (c) the next non-space char starts a new sentence
    (uppercase letter or digit) or the text ends.
    """
    sents: list[str] = []
    buf: list[str] = []
    depth = 0
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        buf.append(c)
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth = max(0, depth - 1)
        elif c in ".!?" and depth == 0:
            # look back for abbreviation
            j = i - 1
            word = []
            while j >= 0 and (text[j].isalnum() or text[j] == "."):
                word.append(text[j])
                j -= 1
            prev = "".join(reversed(word))
            protected = c == "." and (
                prev in _ABBREV
                or prev.rstrip(".") in _ABBREV
                or re.fullmatch(r"\d+(\.\d+)*", prev + ".") is not None
            )
            # next non-space char
            k = i + 1
            while k < n and text[k] == " ":
                k += 1
            ends = (not protected) and (
                k >= n
                or (k > i + 1 and (text[k].isupper() or text[k].isdigit()))
            )
            if ends:
                s = "".join(buf).strip()
                if s:
                    sents.append(s)
                buf = []
                i = k - 1
        i += 1
    tail = "".join(buf).strip()
    if tail:
        sents.append(tail)
    return sents


_TOK_UDF_SCHEMA = T.ArrayType(T.StringType())


def tokenize_udf(col: str = "text"):
    @F.pandas_udf(_TOK_UDF_SCHEMA)
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(tokenize_text)

    return _tok(F.col(col))


def split_sentences_udf(col: str = "text"):
    @F.pandas_udf(_TOK_UDF_SCHEMA)
    def _split(s: pd.Series) -> pd.Series:
        return s.map(split_sentences)

    return _split(F.col(col))


def sentences_from_raw_text(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, sent_no, sentence) for raw
    (punctuated) text via the splitter UDF — the ingest-time analogue
    of corpus.sentences_direct (which handles the pre-normalized
    synthetic corpus natively)."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(split_sentences_udf()).alias("sent_no", "sentence"),
    )
