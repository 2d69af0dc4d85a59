"""Tokenizer/splitter parity with the reference implementations.

The expected outputs below were generated ONCE by running the
reference's own functions (src/renet2/utils/tokenizer.py:16-110
`tokenize`; src/renet2/raw.py:437-545 `snt_split`) over this curated
punctuation/clitic/abbreviation corpus, then frozen as literals so the
test carries no runtime dependency on the reference snapshot. At
build time the same comparison was additionally fuzzed over 800
random punctuation-heavy strings with ZERO divergences in either
function (see BENCH.md round-2 notes).
"""

from renet2_spark.functions.text import split_sentences, tokenize_text

TOKENIZE_VECTORS = [
    ('TP53 (p53), a tumor suppressor gene.',
     ['TP53', '(', 'p53', ')', ',', 'a', 'tumor', 'suppressor', 'gene', '.']),
    ("the gene's role isn't clear",
     ['the', 'gene', "'s", 'role', 'is', "n't", 'clear']),
    ('"quoted start" and [bracket "quotes"]',
     ['"', 'quoted', 'start', '"', 'and', '[', 'bracket', '"', 'quotes', '"', ']']),
    ('values of 0.05, 3.5%, and p=0.01 were seen.',
     ['values', 'of', '0.05', ',', '3.5', '%', ',', 'and', 'p=0.01', 'were', 'seen', '.']),
    ('e.g. mice; i.e. rats. See ref. 4.',
     ['e.g.', 'mice', ';', 'i.e.', 'rats.', 'See', 'ref.', '4', '.']),
    ('BRCA1/BRCA2 mutations -- high-risk variants...',
     ['BRCA1/BRCA2', 'mutations', '--', 'high-risk', 'variants', '...']),
    ('He said "don\'t go". The gene (TP53) matters.',
     ['He', 'said', '"', 'do', "n't", 'go', '"', '.', 'The', 'gene', '(', 'TP53', ')', 'matters', '.']),
    ('A {set} of <tags> and $costs #tags @notes & more',
     ['A', '{', 'set', '}', 'of', '<', 'tags', '>', 'and', '$', 'costs', '#', 'tags', '@', 'notes', '&', 'more']),
    ('Cannot say; cannot stay.',
     ['Can', 'not', 'say', ';', 'can', 'not', 'stay', '.']),
    ("D'ye know? More'n enough.",
     ["D'", 'ye', 'know', '?', 'More', "'n", 'enough', '.']),
    ('ends with brackets (see fig).',
     ['ends', 'with', 'brackets', '(', 'see', 'fig', ')', '.']),
    ('multiple dots..',
     ['multiple', 'dots..']),
    ('trailing spaces.   ',
     ['trailing', 'spaces', '.']),
    ('the cells were cultured. Then analysed.',
     ['the', 'cells', 'were', 'cultured.', 'Then', 'analysed', '.']),
    ('it is 3.5 mg. of compound X. It worked.',
     ['it', 'is', '3.5', 'mg.', 'of', 'compound', 'X.', 'It', 'worked', '.']),
    ('genes regulate pathways. however, results vary.',
     ['genes', 'regulate', 'pathways.', 'however', ',', 'results', 'vary', '.']),
    ('Smith et al. reported this. Jones vs. Brown differ.',
     ['Smith', 'et', 'al.', 'reported', 'this.', 'Jones', 'vs.', 'Brown', 'differ', '.']),
    ('concentrations (10 mg/mL). Next sentence here.',
     ['concentrations', '(', '10', 'mg/mL', ')', '.', 'Next', 'sentence', 'here', '.']),
    ('level was 5.2 (n=3). More text follows.',
     ['level', 'was', '5.2', '(', 'n=3', ')', '.', 'More', 'text', 'follows', '.']),
    ('first clause; second clause. Third sentence here.',
     ['first', 'clause', ';', 'second', 'clause.', 'Third', 'sentence', 'here', '.']),
    ('A study of cancer.',
     ['A', 'study', 'of', 'cancer', '.']),
    ("the protein's binding-site isn't known; it's complex.",
     ['the', 'protein', "'s", 'binding-site', 'is', "n't", 'known', ';', 'it', "'s", 'complex', '.']),
]

SPLIT_VECTORS = [
    ('TP53 (p53), a tumor suppressor gene.',
     ['TP53 (p53), a tumor suppressor gene.']),
    ("the gene's role isn't clear",
     ["the gene's role isn't clear"]),
    ('"quoted start" and [bracket "quotes"]',
     ['"quoted start" and [bracket "quotes"]']),
    ('values of 0.05, 3.5%, and p=0.01 were seen.',
     ['values of 0.05, 3.5%, and p=0.01 were seen.']),
    ('e.g. mice; i.e. rats. See ref. 4.',
     ['e.g. mice; i.e. rats.', ' See ref. 4.']),
    ('BRCA1/BRCA2 mutations -- high-risk variants...',
     ['BRCA1/BRCA2 mutations -- high-risk variants...']),
    ('He said "don\'t go". The gene (TP53) matters.',
     ['He said "don\'t go".', ' The gene (TP53) matters.']),
    ('A {set} of <tags> and $costs #tags @notes & more',
     ['A {set} of <tags> and $costs #tags @notes & more']),
    ('Cannot say; cannot stay.',
     ['Cannot say; cannot stay.']),
    ("D'ye know? More'n enough.",
     ["D'ye know?", " More'n enough."]),
    ('ends with brackets (see fig).',
     ['ends with brackets (see fig).']),
    ('multiple dots..',
     ['multiple dots..']),
    ('trailing spaces.   ',
     ['trailing spaces.   ']),
    ('the cells were cultured. Then analysed.',
     ['the cells were cultured.', ' Then analysed.']),
    ('it is 3.5 mg. of compound X. It worked.',
     ['it is 3.5 mg. of compound X.', ' It worked.']),
    ('genes regulate pathways. however, results vary.',
     ['genes regulate pathways. however, results vary.']),
    ('Smith et al. reported this. Jones vs. Brown differ.',
     ['Smith et al. reported this.', ' Jones vs. Brown differ.']),
    ('concentrations (10 mg/mL). Next sentence here.',
     ['concentrations (10 mg/mL).', ' Next sentence here.']),
    ('level was 5.2 (n=3). More text follows.',
     ['level was 5.2 (n=3).', ' More text follows.']),
    ('first clause; second clause. Third sentence here.',
     ['first clause; second clause.', ' Third sentence here.']),
    ('A study of cancer.',
     ['A study of cancer.']),
    ("the protein's binding-site isn't known; it's complex.",
     ["the protein's binding-site isn't known; it's complex."]),
]


def test_tokenizer_matches_reference_vectors():
    for text, want in TOKENIZE_VECTORS:
        assert tokenize_text(text) == want, text


def test_splitter_matches_reference_vectors():
    for text, want in SPLIT_VECTORS:
        assert split_sentences(text) == want, text


def test_tokenize_series_equals_scalar():
    """The vectorized pd.Series.str chain IS the same rule table."""
    import pandas as pd

    from renet2_spark.functions.text import tokenize_series

    texts = [t for t, _ in TOKENIZE_VECTORS]
    got = tokenize_series(pd.Series(texts)).tolist()
    assert got == [tokenize_text(t) for t in texts]


# ---- secondary variant parity (round-2 verdict next #9) --------------------
# Frozen vectors generated by EXECUTING the reference functions
# (utils/tokenizer.py:112-225 tokenize_s; raw.py:399-433 sentence_split)
# via ast-extraction; a 3,000-string fuzz against the same executed
# reference showed zero divergences for tokenize_s, sentence_split_simple
# and refine_snt at generation time.

TOKENIZE_S_VECTORS = [
    ('The p53 gene (TP53) regulates "cell-cycle" arrest.',
     ['The', 'p53', 'gene', '(', 'TP53', ')', 'regulates', '"', 'cell', '-', 'cycle', '"', 'arrest', '.']),
    ('BRCA1/BRCA2 mutations... cause cancer, e.g. melanoma; see Fig. 2a.',
     ['BRCA1', '/', 'BRCA2', 'mutations', '.', '.', '.', 'cause', 'cancer', ',', 'e', '.', 'g', '.', 'melanoma', ';', 'see', 'Fig', '.', '2a', '.']),
    ("He said 'don't' but they can't. Cannot argue!",
     ['He', 'said', "'", 'do', 'n', "'", 't', "'", 'but', 'they', 'can', "'", 't', '.', 'Can', 'not', 'argue', '!']),
    ('Values: a=1, b+c_2 *d -- done. OK?',
     ['Values', ':', 'a', '=', '1', ',', 'b', '+', 'c', '_', '2', '*', 'd', '-', '-', 'done', '.', 'OK', '?']),
    ('"Quoted start" and [brackets] {curly} <angle> (paren).',
     ['"', 'Quoted', 'start', '"', 'and', '[', 'brackets', ']', '{', 'curly', '}', '<', 'angle', '>', '(', 'paren', ')', '.']),
    ('Ends with period.',
     ['Ends', 'with', 'period', '.']),
    ('trailing closers.)] ',
     ['trailing', 'closers', '.', ')', ']']),
    ('A. B. C. words word.',
     ['A', '.', 'B', '.', 'C', '.', 'words', 'word', '.']),
    ('multi  spaces   here.',
     ['multi', 'spaces', 'here', '.']),
    ('x!',
     ['x', '!']),
    ('semi;colon: test @ # $ % &',
     ['semi', ';', 'colon', ':', 'test', '@', '#', '$', '%', '&']),
    ("gene's 'S 'M 'd n't N'T 'LL",
     ['gene', "'", 's', "'", 'S', "'", 'M', "'", 'd', 'n', "'", 't', 'N', "'", 'T', "'", 'LL']),
    ("d'ye know? D'ye!",
     ['d', "'", 'ye', 'know', '?', 'D', "'", 'ye', '!']),
    ('no punct at all',
     ['no', 'punct', 'at', 'all']),
    ('dots..dots...dots',
     ['dots', '.', '.', 'dots', '.', '.', '.', 'dots']),
]

SENTENCE_SPLIT_VECTORS = [
    ('The p53 gene (TP53) regulates "cell-cycle" arrest.',
     ['The p53 gene (TP53) regulates "cell-cycle" arrest.']),
    ('BRCA1/BRCA2 mutations... cause cancer, e.g. melanoma; see Fig. 2a.',
     ['BRCA1/BRCA2 mutations... cause cancer, e.g. melanoma; see Fig. 2a.']),
    ("He said 'don't' but they can't. Cannot argue!",
     ["He said 'don't' but they can't.", ' Cannot argue!']),
    ('Values: a=1, b+c_2 *d -- done. OK?',
     ['Values: a=1, b+c_2 *d -- done.', ' OK?']),
    ('"Quoted start" and [brackets] {curly} <angle> (paren).',
     ['"Quoted start" and [brackets] {curly} <angle> (paren).']),
    ('Ends with period.',
     ['Ends with period.']),
    ('trailing closers.)] ',
     ['trailing closers.)] ']),
    ('A. B. C. words word.',
     ['A.', ' B.', ' C. words word.']),
    ('multi  spaces   here.',
     ['multi  spaces   here.']),
    ('x!',
     ['x!']),
    ('semi;colon: test @ # $ % &',
     ['semi;colon: test @ # $ % &']),
    ("gene's 'S 'M 'd n't N'T 'LL",
     ["gene's 'S 'M 'd n't N'T 'LL"]),
    ("d'ye know? D'ye!",
     ["d'ye know?", " D'ye!"]),
    ('no punct at all',
     ['no punct at all']),
    ('dots..dots...dots',
     ['dots..dots...dots']),
]


def test_tokenize_s_parity_frozen():
    from renet2_spark.functions.text import tokenize_s

    for s, exp in TOKENIZE_S_VECTORS:
        assert tokenize_s(s) == exp, repr(s)


def test_sentence_split_simple_parity_frozen():
    from renet2_spark.functions.text import sentence_split_simple

    for s, exp in SENTENCE_SPLIT_VECTORS:
        assert sentence_split_simple(s) == exp, repr(s)


def test_refine_snt_bracket_semantics():
    from renet2_spark.functions.text import refine_snt

    # balanced text: offset 0 and an offset AT a depth-1 opening
    # bracket survive (reference keeps starts sitting ON '([{')
    text = "Alpha bet (gamma delta) epsilon."
    assert text[10] == "("
    snts, kept = refine_snt(text, [0, 10, 24])
    assert kept == [0, 10, 24]
    assert snts == ["Alpha bet ", "(gamma delta) ", "epsilon."]
    # offset strictly inside the bracket region is dropped
    snts2, kept2 = refine_snt(text, [0, 14])
    assert kept2 == [0] and snts2 == [text]
    # unbalanced brackets disable the filter entirely
    text3 = "Alpha (beta. Gamma delta."
    snts3, kept3 = refine_snt(text3, [0, 12])
    assert kept3 == [0, 12]
