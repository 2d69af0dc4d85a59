"""Entity-ID canonicalization + per-doc ID unification.

Reference semantics:
* parse_ann_id (src/renet2/parse_data.py:29-41): disease — strip
  'MESH:' prefix, OMIM→MeSH via dict (utils/omim2mesh.py:12-19), first
  of ';'-list; gene — first of ';'-list, strip '(...)', species→human
  via Gene_transfer (utils/gene_transfer.py:10-13, multi ids '|'-joined).
* IsValidMeSH (utils/mesh_match.py:9-14): D-prefix always valid,
  C-prefix valid iff mapped in dict_c2d.
* normalize_ann per-doc name↔id connected components with
  most-frequent-id representative (src/renet2/normalize_ann.py:26-49).

Spark-first: the string surgery is native Catalyst expressions
(regexp_replace/split — whole-stage codegen); the tiny OMIM/transfer
maps become chained `when` literals built from the broadcast dicts
(O(10) entries here; for real-world ~4k-entry maps use
F.broadcast(map_df) joins — :func:`canonicalize_mentions_join` shows
that path). Per-doc unification is a grouped applyInPandas: each
group is ONE document's mentions (bounded, tiny graphs) — no global
connected-components shuffle storm.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dictionaries import GENE_TRANSFER, MESH_C2D_VALID, OMIM2MESH


def _map_literal(col: Column, mapping: dict[str, str]) -> Column:
    out = col
    for k, v in mapping.items():
        out = F.when(col == k, F.lit(v)).otherwise(out)
    return out


def canonical_gene_id(raw: Column) -> Column:
    g = F.split(raw, ";")[0]
    g = F.regexp_replace(g, r"\(.*\)", "")
    transfer = {k: "|".join(v) for k, v in GENE_TRANSFER.items()}
    return _map_literal(g, transfer)


def canonical_disease_id(raw: Column) -> Column:
    d = F.regexp_replace(raw, r"^MESH:", "")
    omim = {f"OMIM:{k}": "|".join(v) for k, v in OMIM2MESH.items()}
    d = _map_literal(d, omim)
    return F.split(d, ";")[0]


def is_valid_mesh(disease_id: Column) -> Column:
    """IsValidMeSH (reference utils/mesh_match.py:9-14)."""
    valid_c = F.lit(False)
    for c in MESH_C2D_VALID:
        valid_c = valid_c | (disease_id == c)
    return disease_id.startswith("D") | valid_c


def canonicalize_mentions(mentions: DataFrame) -> DataFrame:
    """mentions(+raw_id) -> mentions(+entity_id) via native exprs."""
    eid = F.when(
        F.col("type") == "Gene", canonical_gene_id(F.col("raw_id"))
    ).otherwise(canonical_disease_id(F.col("raw_id")))
    out = mentions.withColumn("entity_id", eid)
    return out.filter(
        (F.col("type") == "Gene") | is_valid_mesh(F.col("entity_id"))
    )


def canonicalize_mentions_join(
    mentions: DataFrame, spark: SparkSession, entity_dict: DataFrame
) -> DataFrame:
    """Broadcast-join canonicalization — the shape used when the map is
    thousands of entries (reference dict_omim2mesh = 4,149 rows)."""
    d = entity_dict.select("raw_id", F.col("entity_id").alias("_canon"))
    return (
        mentions.join(F.broadcast(d), "raw_id", "left")
        .withColumn("entity_id", F.coalesce("_canon", "raw_id"))
        .drop("_canon")
    )


_UNIFY_SCHEMA = (
    "doc_id string, sent_no int, tok_no int, start int, end int, "
    "mention string, type string, raw_id string, entity_id string"
)


def unify_doc_ids(mentions: DataFrame) -> DataFrame:
    """Per-document name↔id connected components; every id in a
    component is rewritten to the component's representative — the id
    with the highest mention count, ties broken by id desc
    (reference src/renet2/normalize_ann.py:26-49: add_d_cnt at 19-23,
    representative pick at 45; 'orig;rep' rewrite at 114-121 — we keep
    just the representative, the ';'-form is re-split by
    canonical_gene_id anyway).

    Grouped applyInPandas keyed by doc_id: graphs are bounded by the
    per-doc mention count (<= 512*500), so executor memory is safe at
    any corpus scale; the only shuffle is the groupBy(doc_id).
    """

    def unify(pdf: pd.DataFrame) -> pd.DataFrame:
        for typ in ("Gene", "Disease"):
            sub = pdf[pdf["type"] == typ]
            if sub.empty:
                continue
            parent: dict[str, str] = {}

            def find(x: str) -> str:
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            by_name: dict[str, str] = {}
            for name, eid in zip(sub["mention"].str.lower(), sub["entity_id"]):
                if name in by_name:
                    parent[find(by_name[name])] = find(eid)
                else:
                    by_name[name] = eid
            cnt = sub.groupby("entity_id").size().to_dict()
            comp: dict[str, list[str]] = {}
            for eid in set(sub["entity_id"]):
                comp.setdefault(find(eid), []).append(eid)
            rep_of: dict[str, str] = {}
            for members in comp.values():
                rep = max(members, key=lambda e: (cnt.get(e, 0), e))
                for e in members:
                    rep_of[e] = rep
            mask = pdf["type"] == typ
            pdf.loc[mask, "entity_id"] = pdf.loc[mask, "entity_id"].map(rep_of)
        return pdf

    cols = [f.split(" ")[0] for f in _UNIFY_SCHEMA.split(", ")]
    return (
        mentions.select(*cols)
        .groupBy("doc_id")
        .applyInPandas(unify, schema=_UNIFY_SCHEMA)
    )
