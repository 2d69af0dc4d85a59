"""DuckDB oracle SQL for every SQL-expressible query.

Each builder returns ANSI SQL that DuckDB runs on the driver's raw
parquet views (documents, embeddings, lineitem, ...) reproducing the
Spark pipeline's output exactly: same column names, same values. The
corpus derivation constants (10-word sentences, media rule) and the
entity dictionaries are inlined from the same python constants the
Spark plans use — single source of truth.

Float parity: the deterministic scorer is pure IEEE arithmetic
(+,*,/ and clamp) with the SAME association order in both engines;
no libm calls, so results are bit-identical before round().
"""

from __future__ import annotations

from .dictionaries import (
    DISEASE_CANON,
    DISEASE_EXT_CANON,
    DISEASE_EXT_RAW,
    DISEASE_RAW,
    GENE_CANON,
    GENE_EXT_CANON,
    GENE_EXT_RAW,
    GENE_RAW,
    MULTIWORD_DISEASE,
)
from .operators.dedup import MAX_LSH_BUCKET, MAX_SHINGLE_DF
from .operators.scorer import BIAS, CUTOFF, MODEL_STEP, N_MODELS, W_CNT, W_COOC


def _values(d: dict[str, str], cols: str) -> str:
    rows = ", ".join(f"('{k}', '{v}')" for k, v in d.items())
    return f"(VALUES {rows}) AS {cols}"


def gdict(canon: bool = True) -> str:
    return _values(GENE_CANON if canon else GENE_RAW, "g(surface, gene_id)")


def ddict(canon: bool = True) -> str:
    return _values(
        DISEASE_CANON if canon else DISEASE_RAW, "d(surface, disease_id)"
    )


def edict_raw() -> str:
    rows = ", ".join(
        f"('{s}', 'Gene', '{r}')" for s, r in GENE_RAW.items()
    ) + ", " + ", ".join(
        f"('{s}', 'Disease', '{r}')" for s, r in DISEASE_RAW.items()
    )
    return f"(VALUES {rows}) AS e(surface, type, raw_id)"


def edict_canon() -> str:
    rows = ", ".join(
        f"('{s}', 'Gene', '{GENE_CANON[s]}')" for s in GENE_RAW
    ) + ", " + ", ".join(
        f"('{s}', 'Disease', '{DISEASE_CANON[s]}')" for s in DISEASE_RAW
    )
    return f"(VALUES {rows}) AS e(surface, type, entity_id)"


def edict_ext_canon() -> str:
    """Base dict + cleaning-fixture single-token surfaces (canonical
    ids) — mirrors dictionaries.entity_dict_ext_df."""
    rows = (
        ", ".join(f"('{s}', 'Gene', '{GENE_CANON[s]}')" for s in GENE_RAW)
        + ", "
        + ", ".join(
            f"('{s}', 'Disease', '{DISEASE_CANON[s]}')" for s in DISEASE_RAW
        )
        + ", "
        + ", ".join(
            f"('{s}', 'Gene', '{GENE_EXT_CANON[s]}')" for s in GENE_EXT_RAW
        )
        + ", "
        + ", ".join(
            f"('{s}', 'Disease', '{DISEASE_EXT_CANON[s]}')"
            for s in DISEASE_EXT_RAW
        )
    )
    return f"(VALUES {rows}) AS e(surface, type, entity_id)"


def mwdict_canon() -> str:
    rows = ", ".join(
        f"('{s}', '{c}')" for s, (_r, c) in MULTIWORD_DISEASE.items()
    )
    return f"(VALUES {rows}) AS mw(surface, disease_id)"


# ---- shared CTE fragments over the documents view -----------------------

WORDS = """
words AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, doc_id AS doc_num,
         string_split("text", ' ') AS ws
  FROM documents
)"""

SENTS = WORDS + """,
sents AS (
  SELECT doc_id, doc_num, CAST(t.s AS INT) AS sent_no,
         list_slice(ws, t.s*10+1, t.s*10+10) AS sw, ws
  FROM words,
       unnest(range(CAST(ceil(len(ws)/10.0) AS BIGINT))) AS t(s)
)"""

TOKS = WORDS + """,
toks AS (
  SELECT doc_id, doc_num, ws, CAST(u.k - 1 AS INT) AS k, ws[u.k] AS token
  FROM words, unnest(generate_series(1, len(ws))) AS u(k)
)"""


def q_corpus_spans() -> str:
    """Aggregate view of the interleaved span derivation."""
    return f"""
WITH {WORDS},
base AS (
  SELECT doc_id, doc_num,
         CAST(ceil(len(ws)/10.0) AS INT) AS n_text_spans,
         length(array_to_string(ws, ' ')) AS total_chars
  FROM words
)
SELECT doc_id,
       n_text_spans,
       CAST(len(list_filter(range(2, n_text_spans),
                            s -> (doc_num + s) % 7 = 0)) AS INT) AS n_media_spans,
       CAST(n_text_spans
            + len(list_filter(range(2, n_text_spans),
                              s -> (doc_num + s) % 7 = 0)) AS INT) AS n_spans,
       CAST(total_chars AS BIGINT) AS total_chars
FROM base
"""


def q_sentences() -> str:
    return f"""
WITH {SENTS}
SELECT doc_id, sent_no,
       CASE WHEN sent_no = 0 THEN 'title'
            WHEN sent_no = 1 THEN 'abstract'
            ELSE 'paragraph' END AS kind,
       array_to_string(sw, ' ') AS sentence,
       CAST(CASE WHEN sent_no = 0 THEN 0
            ELSE length(array_to_string(ws[1:sent_no*10], ' ')) + 1
            END AS INT) AS "offset"
FROM sents
"""


def q_media() -> str:
    return f"""
WITH {WORDS},
m AS (
  SELECT doc_id, doc_num, ws, CAST(t.s AS INT) AS s
  FROM words,
       unnest(range(CAST(ceil(len(ws)/10.0) AS BIGINT))) AS t(s)
  WHERE t.s >= 2 AND (doc_num + t.s) % 7 = 0
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS INT)
         AS media_no,
       'img://' || doc_id || '/' || CAST(s AS VARCHAR) AS media_ref,
       CAST(length(array_to_string(ws[1:least((s+1)*10, len(ws))], ' ')) + 1
            AS INT) AS "offset"
FROM m
"""


def q_mentions(canon: bool = True) -> str:
    ed = edict_canon() if canon else edict_raw()
    idcol = "entity_id" if canon else "raw_id"
    return f"""
WITH {TOKS}
SELECT doc_id,
       CAST(k // 10 AS INT) AS sent_no,
       CAST(k % 10 AS INT) AS tok_no,
       CAST(CASE WHEN k = 0 THEN 0
            ELSE length(array_to_string(ws[1:k], ' ')) + 1 END AS INT) AS start,
       CAST(CASE WHEN k = 0 THEN 0
            ELSE length(array_to_string(ws[1:k], ' ')) + 1 END
            + length(token) AS INT) AS "end",
       token AS mention, e.type AS type, e.{idcol} AS {idcol}
FROM toks JOIN {ed} ON lower(token) = e.surface
"""


def q_mentions_clean() -> str:
    """Cleaning chain: singles+bigrams -> cross-sentence drop -> joint
    fusion -> extend-and-replace overlap merge (chain formulation:
    the running end after each scanned tag is that tag's own end, so
    chains break exactly at start >= lag(end) in scan order; per chain
    keep first.start/tok_no, last.end and the LAST tag's identity)."""
    return f"""
WITH {TOKS},
pos AS (
  SELECT doc_id, ws, k, token,
         CAST(CASE WHEN k = 0 THEN 0
              ELSE length(array_to_string(ws[1:k], ' ')) + 1 END AS INT)
           AS start
  FROM toks
),
sing AS (
  SELECT doc_id, CAST(k // 10 AS INT) AS sent_no, CAST(k % 10 AS INT) AS tok_no,
         start, CAST(start + length(token) AS INT) AS "end",
         token AS mention, e.type AS type, e.entity_id AS entity_id, ws
  FROM pos JOIN {edict_ext_canon()} ON lower(token) = e.surface
),
mwm AS (
  SELECT doc_id, CAST(k // 10 AS INT) AS sent_no, CAST(k % 10 AS INT) AS tok_no,
         start,
         CAST(start + length(token) + 1 + length(ws[k + 2]) AS INT) AS "end",
         token || ' ' || ws[k + 2] AS mention, 'Disease' AS type,
         mw.disease_id AS entity_id, ws
  FROM pos JOIN {mwdict_canon()}
    ON k + 2 <= len(ws) AND lower(token || ' ' || ws[k + 2]) = mw.surface
),
allm AS (SELECT * FROM sing UNION ALL SELECT * FROM mwm),
cs AS (
  SELECT * FROM allm
  WHERE "end" <= length(array_to_string(
        ws[1:least((sent_no + 1) * 10, len(ws))], ' '))
),
fused AS (
  SELECT doc_id, sent_no, tok_no, start, "end", mention,
         CASE WHEN g IS NOT NULL AND d IS NOT NULL THEN 'Gene-Disease'
              WHEN g IS NOT NULL THEN 'Gene' ELSE 'Disease' END AS type,
         CASE WHEN g IS NOT NULL AND d IS NOT NULL THEN d || '>-<' || g
              WHEN g IS NOT NULL THEN g ELSE d END AS entity_id
  FROM (SELECT doc_id, sent_no, tok_no, start, "end", mention,
               max(CASE WHEN type = 'Gene' THEN entity_id END) AS g,
               max(CASE WHEN type = 'Disease' THEN entity_id END) AS d
        FROM cs GROUP BY 1, 2, 3, 4, 5, 6)
),
chains AS (
  SELECT *,
         sum(CASE WHEN prev_end IS NULL OR start >= prev_end
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id, sent_no
                 ORDER BY start, "end", mention, type, entity_id, tok_no
                 ROWS UNBOUNDED PRECEDING) AS chain
  FROM (SELECT *,
               lag("end") OVER w AS prev_end,
               row_number() OVER w AS rn
        FROM fused
        WINDOW w AS (PARTITION BY doc_id, sent_no
                     ORDER BY start, "end", mention, type, entity_id, tok_no))
)
SELECT doc_id, sent_no,
       CAST(min_by(tok_no, rn) AS INT) AS tok_no,
       CAST(min_by(start, rn) AS INT) AS start,
       CAST(max_by("end", rn) AS INT) AS "end",
       max_by(mention, rn) AS mention,
       max_by(type, rn) AS type,
       max_by(entity_id, rn) AS entity_id
FROM chains GROUP BY doc_id, sent_no, chain
"""


def q_mentions_capped(max_sents: int = 4, max_tokens: int = 7,
                      max_chars: int = 200) -> str:
    """Caps: sentence s kept iff s < max_sents and its char offset <
    max_chars; each kept sentence truncated to max_tokens tokens —
    i.e. token k survives iff k//10 < max_sents, k%10 < max_tokens,
    offset(k//10) < max_chars."""
    return f"""
WITH {TOKS}
SELECT doc_id,
       CAST(k // 10 AS INT) AS sent_no,
       CAST(k % 10 AS INT) AS tok_no,
       CAST(CASE WHEN k = 0 THEN 0
            ELSE length(array_to_string(ws[1:k], ' ')) + 1 END AS INT) AS start,
       CAST(CASE WHEN k = 0 THEN 0
            ELSE length(array_to_string(ws[1:k], ' ')) + 1 END
            + length(token) AS INT) AS "end",
       token AS mention, e.type AS type, e.entity_id AS entity_id
FROM toks JOIN {edict_canon()} ON lower(token) = e.surface
WHERE k // 10 < {max_sents}
  AND k % 10 < {max_tokens}
  AND (CASE WHEN k // 10 = 0 THEN 0
       ELSE length(array_to_string(ws[1:(k // 10) * 10], ' ')) + 1 END)
      < {max_chars}
"""


def q_mentions_verified() -> str:
    """F5: mentions whose start was corrupted ((sent_no+tok_no)%5==2)
    fail the substring-vs-mention check and are dropped — the kept set
    is exactly the uncorrupted raw mentions."""
    return f"""
WITH {TOKS}
SELECT doc_id,
       CAST(k // 10 AS INT) AS sent_no,
       CAST(k % 10 AS INT) AS tok_no,
       CAST(CASE WHEN k = 0 THEN 0
            ELSE length(array_to_string(ws[1:k], ' ')) + 1 END AS INT) AS start,
       CAST(CASE WHEN k = 0 THEN 0
            ELSE length(array_to_string(ws[1:k], ' ')) + 1 END
            + length(token) AS INT) AS "end",
       token AS mention, e.type AS type, e.raw_id AS raw_id
FROM toks JOIN {edict_raw()} ON lower(token) = e.surface
WHERE ((k // 10) + (k % 10)) % 5 != 2
"""


def q_tokens_rnn() -> str:
    """F8 Filter_rnn: injected punctuation drops (incl. the multi-char
    substring rule), dictionary positions survive, survivors renumber
    and non-entity tokens lowercase."""
    from .functions.text import RNN_FILTERS

    surfaces = ", ".join(
        f"('{s}')" for s in list(GENE_RAW) + list(DISEASE_RAW)
    )
    # the filter string contains no single quotes; tab/newline embed raw
    return f"""
WITH {TOKS},
inj AS (
  SELECT doc_id, CAST(k // 10 AS INT) AS sent_no, CAST(k % 10 AS INT)
           AS orig_tok_no, k,
         CASE WHEN k % 13 = 4 THEN '('
              WHEN k % 17 = 9 THEN '<='
              ELSE token END AS token
  FROM toks
),
flagged AS (
  SELECT i.*, (s.surface IS NOT NULL) AS ent
  FROM inj i LEFT JOIN (VALUES {surfaces}) AS s(surface)
    ON lower(i.token) = s.surface
),
kept AS (
  SELECT doc_id, sent_no, orig_tok_no, k,
         CASE WHEN ent THEN token ELSE lower(token) END AS token
  FROM flagged
  WHERE ent OR NOT (token = '' OR strpos('{RNN_FILTERS}', token) > 0)
)
SELECT doc_id, sent_no,
       CAST(row_number() OVER (PARTITION BY doc_id, sent_no ORDER BY k) - 1
            AS INT) AS tok_no,
       orig_tok_no, token
FROM kept
"""


def q_bioc_roundtrip() -> str:
    """S4/F2/F4: expected kept spans of the synthetic BioC rendering —
    title (no section_type), abstract, RESULTS paragraph, figure;
    funding (skip list) and METHODS (whitelist-excluded) dropped."""
    return f"""
WITH {WORDS},
parts AS (
  SELECT doc_id,
         coalesce(array_to_string(ws[1:10], ' '), '') AS title,
         coalesce(array_to_string(list_slice(ws, 11, 20), ' '), '')
           AS abstract,
         coalesce(array_to_string(list_slice(ws, 21, len(ws)), ' '), '')
           AS body
  FROM words
)
SELECT doc_id, CAST(0 AS INT) AS span_no, 'title' AS kind, title AS "text",
       CAST(NULL AS VARCHAR) AS media_ref, CAST(0 AS INT) AS "offset"
FROM parts
UNION ALL
SELECT doc_id, 1, 'abstract', abstract, NULL,
       CAST(length(title) + 1 AS INT) FROM parts
UNION ALL
SELECT doc_id, 2, 'paragraph', body, NULL,
       CAST(length(title) + length(abstract) + 2 AS INT) FROM parts
UNION ALL
SELECT doc_id, 3, 'figure', '', 'img://' || doc_id, 9002 FROM parts
"""


def _pairs_cte() -> str:
    return f"""
{SENTS},
sg AS (
  SELECT doc_id, sent_no, g.gene_id
  FROM sents JOIN {gdict()} ON list_contains(list_transform(sw, t -> lower(t)), g.surface)
),
sd AS (
  SELECT doc_id, sent_no, d.disease_id
  FROM sents JOIN {ddict()} ON list_contains(list_transform(sw, t -> lower(t)), d.surface)
),
pairs AS (
  SELECT doc_id, gene_id, disease_id, CAST(count(*) AS INT) AS n_cooc_sents
  FROM sg JOIN sd USING (doc_id, sent_no)
  GROUP BY 1, 2, 3
)"""


def q_pairs() -> str:
    return f"WITH {_pairs_cte()} SELECT * FROM pairs"


def q_pairs_doc() -> str:
    return f"""
WITH {TOKS},
dg AS (SELECT DISTINCT doc_id, g.gene_id
       FROM toks JOIN {gdict()} ON lower(token) = g.surface),
dd AS (SELECT DISTINCT doc_id, d.disease_id
       FROM toks JOIN {ddict()} ON lower(token) = d.surface)
SELECT doc_id, gene_id, disease_id FROM dg JOIN dd USING (doc_id)
"""


def _features_cte() -> str:
    return f"""
{_pairs_cte()},
tok AS (
  SELECT doc_id, unnest(ws) AS token FROM words
),
gc AS (
  SELECT doc_id, g.gene_id, CAST(count(*) AS INT) AS n_g
  FROM tok JOIN {gdict()} ON lower(token) = g.surface GROUP BY 1, 2
),
dc AS (
  SELECT doc_id, d.disease_id, CAST(count(*) AS INT) AS n_d
  FROM tok JOIN {ddict()} ON lower(token) = d.surface GROUP BY 1, 2
),
feats AS (
  SELECT p.doc_id, p.gene_id, p.disease_id, p.n_cooc_sents, gc.n_g, dc.n_d
  FROM pairs p
  JOIN gc ON p.doc_id = gc.doc_id AND p.gene_id = gc.gene_id
  JOIN dc ON p.doc_id = dc.doc_id AND p.disease_id = dc.disease_id
)"""


def q_pairs_labeled() -> str:
    """J1 labels join: sentence pairs LEFT-join the deterministic label
    fixture (operators/labels.py) + fillna(0)."""
    return f"""
WITH {_pairs_cte()},
dg AS (SELECT DISTINCT doc_id, g.gene_id
       FROM sents, unnest(sw) AS u(token)
       JOIN {gdict()} ON lower(u.token) = g.surface),
dd AS (SELECT DISTINCT doc_id, d.disease_id
       FROM sents, unnest(sw) AS u(token)
       JOIN {ddict()} ON lower(u.token) = d.surface),
doc_pairs AS (SELECT doc_id, gene_id, disease_id FROM dg JOIN dd USING (doc_id)),
labels AS (
  SELECT doc_id, gene_id, disease_id,
         CASE WHEN dgt < 4 THEN 1.0 WHEN dgt < 6 THEN 0.5 ELSE 0.0 END AS label
  FROM (SELECT *,
               strpos('0123456789abcdef',
                      substr(md5(doc_id || ':' || gene_id || ':' || disease_id),
                             1, 1)) - 1 AS dgt
        FROM doc_pairs)
  WHERE dgt < 8
)
SELECT p.doc_id, p.gene_id, p.disease_id, p.n_cooc_sents,
       coalesce(l.label, 0.0) AS label
FROM pairs p
LEFT JOIN labels l
  ON p.doc_id = l.doc_id AND p.gene_id = l.gene_id
  AND p.disease_id = l.disease_id
"""


def q_unify() -> str:
    """A6 per-doc id unification over parity-salted ids: components are
    per-(doc, type, surface) star graphs here (each salted id maps to
    exactly one surface), so the representative — max mention count,
    ties by id desc (reference normalize_ann.py:26-49) — reduces to a
    per-surface argmax over (count, id)."""
    return f"""
WITH {TOKS},
m AS (
  SELECT doc_id, CAST(k // 10 AS INT) AS sent_no, CAST(k % 10 AS INT) AS tok_no,
         token AS mention, e.type AS type, e.surface AS surface,
         e.entity_id || '_' || CAST((k % 10) % 2 AS VARCHAR) AS entity_id
  FROM toks JOIN {edict_canon()} ON lower(token) = e.surface
),
cnt AS (
  SELECT doc_id, type, surface, entity_id, count(*) AS n
  FROM m GROUP BY 1, 2, 3, 4
),
rep AS (
  SELECT doc_id, type, surface,
         split_part(max(printf('%08d', n) || '|' || entity_id), '|', 2)
           AS rep_id
  FROM cnt GROUP BY 1, 2, 3
)
SELECT m.doc_id, m.sent_no, m.tok_no, m.mention, m.type,
       r.rep_id AS entity_id
FROM m JOIN rep r
  ON m.doc_id = r.doc_id AND m.type = r.type AND m.surface = r.surface
"""


def _prob_expr(i: int) -> str:
    logit = (
        f"({W_COOC} * CAST(n_cooc_sents AS DOUBLE)"
        f" + {W_CNT} * (CAST(n_g AS DOUBLE) + CAST(n_d AS DOUBLE))"
        f" + {BIAS} + {MODEL_STEP} * {float(i)})"
    )
    return f"greatest(0.0, least(1.0, 0.5 + {logit} / 8.0))"


def _scored_cte() -> str:
    probs_sum = " + ".join(_prob_expr(i) for i in range(N_MODELS))
    hits = " + ".join(
        f"(CASE WHEN {_prob_expr(i)} > 0.5 THEN 1 ELSE 0 END)"
        for i in range(N_MODELS)
    )
    return f"""
{_features_cte()},
scored AS (
  SELECT doc_id, gene_id, disease_id, n_cooc_sents, n_g, n_d,
         CAST({hits} AS INT) AS hit_cnt,
         round((0.0 + {probs_sum}) / {float(N_MODELS)}, 5) AS prob_avg
  FROM feats
)"""


def q_scores() -> str:
    return f"WITH {_scored_cte()} SELECT * FROM scored"


def q_scores_probx() -> str:
    """T8: ';'-joined per-model probs at 5 decimals (reference
    '{:,.5f}', predict.py:131-136). printf('%.5f') == Spark
    format_number for probs <= 1 (no comma grouping below 1000; both
    round the same IEEE double)."""
    prob_x = " || ';' || ".join(
        f"printf('%.5f', {_prob_expr(i)})" for i in range(N_MODELS)
    )
    return f"""
WITH {_scored_cte()}
SELECT doc_id, gene_id, disease_id, hit_cnt, prob_avg, {prob_x} AS "prob_X"
FROM scored
"""


def q_edges() -> str:
    return f"""
WITH {_scored_cte()},
voted AS (SELECT * FROM scored WHERE hit_cnt >= {CUTOFF}),
gnames AS (
  SELECT doc_id, g.gene_id,
         string_agg(DISTINCT token, '|' ORDER BY token) AS g_name
  FROM tok JOIN {gdict()} ON lower(token) = g.surface GROUP BY 1, 2
),
dnames AS (
  SELECT doc_id, d.disease_id,
         string_agg(DISTINCT token, '|' ORDER BY token) AS d_name
  FROM tok JOIN {ddict()} ON lower(token) = d.surface GROUP BY 1, 2
)
SELECT v.doc_id, v.gene_id, 'associated_with' AS predicate, v.disease_id,
       gn.g_name, dn.d_name, v.prob_avg, v.hit_cnt
FROM voted v
JOIN gnames gn ON v.doc_id = gn.doc_id AND v.gene_id = gn.gene_id
JOIN dnames dn ON v.doc_id = dn.doc_id AND v.disease_id = dn.disease_id
"""


def q_nodes() -> str:
    return f"""
WITH {TOKS}
SELECT e.type AS type, e.entity_id AS entity_id,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM toks JOIN {edict_canon()} ON lower(token) = e.surface
GROUP BY 1, 2
"""


# ---- dedup / similarity / textstats oracles ------------------------------

SHINGLES = """
shingles AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc_id,
         array_to_string(list_slice(ws, t.i + 1, t.i + 5), ' ') AS shingle
  FROM (SELECT doc_id, string_split("text", ' ') AS ws FROM documents) w,
       unnest(range(greatest(len(ws) - 5, 0) + 1)) AS t(i)
)"""


def q_dedup_exact() -> str:
    return """
SELECT md5("text") AS text_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(CAST(doc_id AS VARCHAR)) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def _jaccard_cte(threshold: float, max_shingle_df: int = MAX_SHINGLE_DF) -> str:
    # max_shingle_df mirrors dedup.MAX_SHINGLE_DF: sizes over ALL
    # shingles, intersection over df-capped shingles only
    return f"""
{SHINGLES},
sizes AS (SELECT doc_id, CAST(count(*) AS INT) AS n_sh FROM shingles GROUP BY 1),
capped AS (
  SELECT * FROM shingles
  WHERE shingle IN (SELECT shingle FROM shingles
                    GROUP BY shingle HAVING count(*) <= {max_shingle_df})
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS INT) AS n_common
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
         round(CAST(n_common AS DOUBLE)
               / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 5) AS jaccard
  FROM common
  JOIN sizes sa ON common.doc_a = sa.doc_id
  JOIN sizes sb ON common.doc_b = sb.doc_id
)"""


def q_dedup_ngram(threshold: float = 0.7) -> str:
    return f"""
WITH {_jaccard_cte(threshold)}
SELECT doc_a, doc_b, n_common, n_a, n_b, jaccard
FROM jpairs WHERE jaccard >= {threshold}
"""


def q_dedup_minhash(threshold: float = 0.7, k: int = 12, bands: int = 4,
                    max_bucket: int = MAX_LSH_BUCKET) -> str:
    r = k // bands
    mh_cols = ", ".join(
        f"min(md5('{i}:' || shingle)) AS mh_{i}" for i in range(k)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(f"mh_{b * r + j}" for j in range(r))
        + ") AS band_key FROM sig"
        for b in range(bands)
    )
    return f"""
WITH {_jaccard_cte(threshold)},
sig AS (SELECT doc_id, {mh_cols} FROM shingles GROUP BY doc_id),
keys AS ({band_rows}),
ckeys AS (
  SELECT doc_id, band, band_key FROM (
    SELECT *, row_number() OVER (PARTITION BY band, band_key
                                 ORDER BY doc_id) AS r
    FROM keys) WHERE r <= {max_bucket}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ckeys a JOIN ckeys b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, j.jaccard
FROM cand c JOIN jpairs j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= {threshold}
"""


def _simhash_expr(bits: int = 64) -> str:
    # bit j = bit (3 - j//32) of hex digit (j % 32) of md5(token) —
    # mirrors dedup.simhash exactly
    parts = []
    for j in range(bits):
        d = (
            f"(strpos('0123456789abcdef', "
            f"substr(md5(token), {(j % 32) + 1}, 1)) - 1)"
        )
        bit = f"(CASE WHEN ({d} >> {3 - j // 32}) & 1 = 1 THEN 1 ELSE -1 END)"
        parts.append(f"(CASE WHEN sum({bit}) >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(parts)


def q_simhash(bits: int = 64) -> str:
    return f"""
WITH dtok AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc_id, unnest(ws) AS token
  FROM (SELECT doc_id, list_distinct(string_split("text", ' ')) AS ws
        FROM documents)
)
SELECT doc_id, {_simhash_expr(bits)} AS simhash
FROM dtok GROUP BY doc_id
"""


def q_dedup_simhash(bits: int = 64) -> str:
    return f"""
WITH dtok AS (
  SELECT DISTINCT CAST(doc_id AS VARCHAR) AS doc_id, unnest(ws) AS token
  FROM (SELECT doc_id, list_distinct(string_split("text", ' ')) AS ws
        FROM documents)
),
sig AS (SELECT doc_id, {_simhash_expr(bits)} AS simhash
        FROM dtok GROUP BY doc_id)
SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS keeper_doc_id
FROM sig GROUP BY 1 HAVING count(*) > 1
"""


_COS = (
    "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 5)"
)


def q_dedup_embedding(threshold: float = 0.9) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_COS} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS} >= {threshold}
"""


def q_ann_topk(k: int = 5, n_queries: int = 20) -> str:
    return f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
  WHERE a.vec_id < {n_queries}
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {k}
"""


def q_text_stats() -> str:
    return """
WITH w AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "text" AS txt,
                  string_split("text", ' ') AS ws FROM documents)
SELECT doc_id,
       CAST(len(ws) AS INT) AS n_tokens,
       CAST(length(txt) AS INT) AS n_chars,
       round(CAST(length(txt) - (len(ws) - 1) AS DOUBLE)
             / CAST(len(ws) AS DOUBLE), 5) AS avg_token_len,
       round(CAST(len(list_filter(ws, x -> x IN ('the', 'a'))) AS DOUBLE)
             / CAST(len(ws) AS DOUBLE), 5) AS stopword_ratio,
       round(least(1.0, CAST(len(ws) AS DOUBLE) / 100.0)
             * (1.0 - CAST(len(list_filter(ws, x -> x IN ('the', 'a')))
                           AS DOUBLE) / CAST(len(ws) AS DOUBLE)), 5)
         AS quality_score
FROM w
"""


def q_lang_id() -> str:
    return """
WITH w AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang,
                  string_split("text", ' ') AS ws FROM documents)
SELECT doc_id, lang,
       CASE WHEN len(list_filter(ws, x -> x IN ('the', 'a'))) > 0
            THEN 'en' ELSE 'und' END AS lang_pred,
       round(CAST(len(list_filter(ws, x -> x IN ('the', 'a'))) AS DOUBLE)
             / CAST(len(ws) AS DOUBLE), 5) AS lang_conf
FROM w
"""


def q_token_counts() -> str:
    return """
WITH w AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                  string_split("text", ' ') AS ws FROM documents)
SELECT doc_id,
       CAST(len(ws) AS INT) AS ws_tokens,
       CAST(list_sum(list_transform(ws,
            x -> CAST(ceil(length(x) / 4.0) AS INT))) AS INT) AS subword_tokens
FROM w
"""


def q_fingerprint() -> str:
    return """
WITH w AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "text" AS txt,
                  string_split("text", ' ') AS ws FROM documents)
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(ws, x -> CAST(ascii(substr(x, 1, 1)) * 100
                                        + length(x) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) AS fp,
       md5(txt) AS text_md5
FROM w
"""


# ---- relational coverage / metrics / multimodal oracles -------------------


def q_rel_agg_filter() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY 1, 2
"""


def q_rel_join_left_fillna() -> str:
    return """
SELECT o_orderkey, o_custkey,
       coalesce(c_name, 'UNKNOWN') AS cust_name,
       coalesce(c_acctbal, 0.0) AS acctbal
FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
  ON o_custkey = c.c_custkey
"""


def q_rel_semi() -> str:
    return """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_rel_anti() -> str:
    return """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_rel_window_rank() -> str:
    return """
SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q_rel_window_lag() -> str:
    return """
SELECT user_id, event_id,
       round(value - lag(value, 1, 0.0) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC), 5)
         AS value_delta
FROM events
"""


def q_rel_union_distinct() -> str:
    return """
SELECT DISTINCT * FROM (
  SELECT o_custkey AS key, 'order' AS src FROM orders
  UNION ALL
  SELECT c_custkey AS key, 'customer' AS src FROM customer
)
"""


def q_rel_topk() -> str:
    return """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
"""


def q_rel_grouping_top_nation() -> str:
    return """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / count(*) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 HAVING count(*) > 1
"""


def q_rel_json_extract() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(props->>'k' AS INT)) AS INT) AS max_k
FROM events GROUP BY 1
"""


def q_kg_pr_vs_strong_cooc() -> str:
    return f"""
WITH {_scored_cte()},
voted AS (
  SELECT DISTINCT doc_id, gene_id, disease_id FROM scored
  WHERE hit_cnt >= {CUTOFF}
),
gold AS (
  SELECT DISTINCT doc_id, gene_id, disease_id FROM pairs
  WHERE n_cooc_sents >= 3
),
counts AS (
  SELECT (SELECT count(*) FROM voted JOIN gold USING (doc_id, gene_id, disease_id)) AS tp,
         (SELECT count(*) FROM voted) AS n_pred,
         (SELECT count(*) FROM gold) AS n_gold
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_gold AS BIGINT) AS n_gold,
       round(tp / CAST(n_pred AS DOUBLE), 5) AS precision,
       round(tp / CAST(n_gold AS DOUBLE), 5) AS recall,
       round(2.0 * (tp / CAST(n_pred AS DOUBLE)) * (tp / CAST(n_gold AS DOUBLE))
             / ((tp / CAST(n_pred AS DOUBLE)) + (tp / CAST(n_gold AS DOUBLE))), 5)
         AS f1
FROM counts
"""


def _hexbyte(hexpr: str, i: int) -> str:
    """SQL for byte i (0-based) of a 32-hex-char md5 string expr."""
    hi = f"(strpos('0123456789abcdef', substr({hexpr}, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos('0123456789abcdef', substr({hexpr}, {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


def q_media_features() -> str:
    media = q_media().strip()
    b = lambda i: _hexbyte("md5(media_ref)", i)
    return f"""
WITH media AS ({media})
SELECT doc_id, media_no, media_ref,
       CAST(16 AS INT) AS bytes_len,
       CAST(64 + {b(0)} % 192 AS INT) AS width,
       CAST(64 + {b(1)} % 192 AS INT) AS height,
       CAST(1 + {b(2)} % 4 AS INT) AS n_channels,
       round({b(3)} / 255.0, 5) AS f0,
       round({b(4)} / 255.0, 5) AS f1
FROM media
"""


def q_media_frames(stride: int = 4) -> str:
    media = q_media().strip()
    b15 = _hexbyte("md5(media_ref)", 15)
    return f"""
WITH media AS ({media}),
m AS (SELECT doc_id, media_ref,
             CAST(1 + {b15} % 32 AS INT) AS n_frames
      FROM media)
SELECT doc_id, media_ref, n_frames, CAST(t.f AS INT) AS frame_no
FROM m, unnest(range(0, n_frames, {stride})) AS t(f)
"""


def q_kg_threshold_sweep() -> str:
    return f"""
WITH {_scored_cte()},
flags AS (
  SELECT prob_avg, (n_cooc_sents >= 3) AS gold FROM scored
),
grid AS (SELECT t.i / 20.0 AS threshold
         FROM unnest(generate_series(1, 18)) AS t(i)),
swept AS (
  SELECT threshold,
         CAST(sum(CASE WHEN prob_avg > threshold AND gold THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(sum(CASE WHEN prob_avg > threshold THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pred,
         CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS n_gold
  FROM flags CROSS JOIN grid GROUP BY threshold
)
SELECT threshold, tp, n_pred, n_gold,
       CASE WHEN tp > 0 THEN
         2 * (tp / CAST(n_pred AS DOUBLE)) * (tp / CAST(n_gold AS DOUBLE))
           / ((tp / CAST(n_pred AS DOUBLE)) + (tp / CAST(n_gold AS DOUBLE)))
       ELSE 0.0 END AS f1
FROM swept ORDER BY f1 DESC, threshold ASC LIMIT 1
"""


def q_dedup_survivors(threshold: float = 0.7) -> str:
    return f"""
WITH {_jaccard_cte(threshold)},
losers AS (
  SELECT DISTINCT doc_b AS doc_id FROM jpairs WHERE jaccard >= {threshold}
)
SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
       CAST(length(d."text") AS INT) AS n_chars
FROM documents d
WHERE CAST(d.doc_id AS VARCHAR) NOT IN (SELECT doc_id FROM losers)
"""


def q_corpus_metrics(max_sents: int = 32) -> str:
    """A7 count-stats (reference raw_handler.py:98-114)."""
    return f"""
WITH {WORDS},
per AS (SELECT len(ws) AS n_tok,
               CAST(ceil(len(ws) / 10.0) AS INT) AS n_sent
        FROM words)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(n_sent) AS BIGINT) AS n_sents,
       CAST(sum(CASE WHEN n_sent > {max_sents} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_over_snt_cap,
       round(CAST(sum(n_tok) AS DOUBLE) / CAST(sum(n_sent) AS DOUBLE), 5)
         AS avg_tokens_per_sent
FROM per
"""


def q_silver_negatives(n_tools: int = 4) -> str:
    """J6 silver-vote merge (reference train.py:451-480)."""
    tool_branches = " UNION ALL ".join(
        f"""
SELECT doc_id, gene_id, disease_id, {i} AS tool,
       CASE WHEN dgt < 2 THEN 1 ELSE 0 END AS pred
FROM (SELECT *,
             strpos('0123456789abcdef',
                    substr(md5('t{i}:' || doc_id || ':' || gene_id || ':'
                               || disease_id), 1, 1)) - 1 AS dgt
      FROM doc_pairs)
WHERE dgt < 8"""
        for i in range(n_tools)
    )
    return f"""
WITH {TOKS},
dg AS (SELECT DISTINCT doc_id, g.gene_id
       FROM toks JOIN {gdict()} ON lower(token) = g.surface),
dd AS (SELECT DISTINCT doc_id, d.disease_id
       FROM toks JOIN {ddict()} ON lower(token) = d.surface),
doc_pairs AS (SELECT doc_id, gene_id, disease_id FROM dg JOIN dd USING (doc_id)),
votes AS ({tool_branches}),
agg AS (
  SELECT doc_id, gene_id, disease_id, max(pred) AS any_pos,
         CAST(count(*) AS INT) AS n_tools
  FROM votes GROUP BY 1, 2, 3
),
annotated AS (
  SELECT doc_id, gene_id, disease_id
  FROM (SELECT *,
               strpos('0123456789abcdef',
                      substr(md5(doc_id || ':' || gene_id || ':' || disease_id),
                             1, 1)) - 1 AS dgt
        FROM doc_pairs)
  WHERE dgt < 8
)
SELECT a.doc_id, a.gene_id, a.disease_id, a.n_tools, 0.0 AS label
FROM agg a
WHERE a.any_pos = 0
  AND NOT EXISTS (SELECT 1 FROM annotated x
                  WHERE x.doc_id = a.doc_id AND x.gene_id = a.gene_id
                    AND x.disease_id = a.disease_id)
"""


def _lsh_planes_sql(n_planes: int, n_tables: int, dim: int = 64,
                    seed: int = 42) -> list[list[str]]:
    """Per-table bucket-bit dot-product literals, sharing the EXACT
    plane values the Spark side uses (similarity._hyperplanes)."""
    from .operators.similarity import _hyperplanes

    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        bits = []
        for p in planes:
            lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
            bits.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
                f"{lit}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
            )
        tables.append(bits)
    return tables


def _lsh_buckets_cte(n_planes: int, n_tables: int) -> str:
    branches = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {' || '.join(bits)} AS bucket "
        f"FROM embeddings"
        for t, bits in enumerate(_lsh_planes_sql(n_planes, n_tables))
    )
    return f"buckets AS ({branches})"


def q_dedup_embedding_lsh(threshold: float = 0.9, n_planes: int = 4,
                          n_tables: int = 8,
                          max_bucket: int = MAX_LSH_BUCKET) -> str:
    """LSH-blocked embedding near-dup — EXACT oracle: the random
    hyperplanes are deterministic literals, so DuckDB reproduces
    candidate generation bit-for-bit (sign of the same IEEE dot
    product) and the exact-cosine verify. Bucket membership capped at
    max_bucket like the engine (cap_hot_buckets)."""
    return f"""
WITH {_lsh_buckets_cte(n_planes, n_tables)},
cbuckets AS (
  SELECT vec_id, tbl, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY tbl, bucket
                                 ORDER BY vec_id) AS r
    FROM buckets) WHERE r <= {max_bucket}
),
cand AS (
  SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
  FROM cbuckets x JOIN cbuckets y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT c.va AS vec_a, c.vb AS vec_b, {_COS} AS cos
FROM cand c
JOIN embeddings a ON a.vec_id = c.va
JOIN embeddings b ON b.vec_id = c.vb
WHERE {_COS} >= {threshold}
"""


def q_ann_topk_lsh(k: int = 5, n_queries: int = 20, n_planes: int = 8,
                   n_tables: int = 4,
                   max_bucket: int = MAX_LSH_BUCKET) -> str:
    """Approximate top-k with LSH candidates — exact oracle (same
    literal hyperplanes): candidates within shared buckets (corpus
    side capped at max_bucket per bucket like the engine; query side
    uncapped), exact cosine re-rank, rank over the ROUNDED cosine like
    the Spark side."""
    return f"""
WITH {_lsh_buckets_cte(n_planes, n_tables)},
cbuckets AS (
  SELECT vec_id, tbl, bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY tbl, bucket
                                 ORDER BY vec_id) AS r
    FROM buckets) WHERE r <= {max_bucket}
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id
  FROM buckets q JOIN cbuckets v
    ON q.tbl = v.tbl AND q.bucket = v.bucket AND q.vec_id != v.vec_id
  WHERE q.vec_id < {n_queries}
),
scored AS (
  SELECT c.query_id, c.neighbor_id, {_COS} AS cos
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.query_id
  JOIN embeddings b ON b.vec_id = c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= {k}
"""
