"""Canonicalization (parse_ann_id semantics) + per-doc id unification
(normalize_ann connected components) on crafted fixtures."""

from renet2_spark.dictionaries import (
    normalize_disease_id,
    normalize_gene_id,
)
from renet2_spark.operators.normalize import (
    canonicalize_mentions,
    unify_doc_ids,
)


def test_normalize_gene_id_rules():
    # reference parse_data.py:33-41
    assert normalize_gene_id("1001") == "1001"
    assert normalize_gene_id("2008(tax:10090);9999") == "1008"
    assert normalize_gene_id("5;6;7") == "5"


def test_normalize_disease_id_rules():
    # reference parse_data.py:29-33 + omim2mesh + mesh ';' rule
    assert normalize_disease_id("MESH:D0001") == "D0001"
    assert normalize_disease_id("OMIM:600100") == "D0004"
    assert normalize_disease_id("MESH:C0005;D0009") == "C0005"
    assert normalize_disease_id("D0003") == "D0003"


def _mention(doc, sent, tok, mention, typ, raw):
    return (doc, sent, tok, tok * 5, tok * 5 + len(mention), mention, typ, raw)


SCHEMA = (
    "doc_id string, sent_no int, tok_no int, start int, end int, "
    "mention string, type string, raw_id string"
)


def test_canonicalize_mentions_spark(spark):
    rows = [
        _mention("d1", 0, 0, "vector", "Gene", "2008(tax:10090);9999"),
        _mention("d1", 0, 1, "stream", "Disease", "OMIM:600100"),
        _mention("d1", 0, 2, "dup", "Disease", "MESH:C0005;D0009"),
        _mention("d1", 0, 3, "slow", "Disease", "MESH:D0001"),
        # invalid C-prefixed mesh id must be dropped (IsValidMeSH)
        _mention("d1", 0, 4, "bogus", "Disease", "MESH:C9999"),
    ]
    out = canonicalize_mentions(spark.createDataFrame(rows, SCHEMA))
    got = {r["mention"]: r["entity_id"] for r in out.collect()}
    assert got == {
        "vector": "1008",
        "stream": "D0004",
        "dup": "C0005",
        "slow": "D0001",
    }


def test_unify_doc_ids_connected_components(spark):
    """Same surface with two ids links them; the representative is the
    most frequent id, ties by id desc (reference normalize_ann.py:45)."""
    rows = [
        # 'tp53' seen under id 7157 (twice) and 1234 (once) -> rep 7157
        _mention("d1", 0, 0, "tp53", "Gene", "x") + (),
        _mention("d1", 0, 1, "tp53", "Gene", "x"),
        _mention("d1", 1, 0, "tp53", "Gene", "x"),
        # separate component untouched
        _mention("d1", 1, 1, "brca1", "Gene", "x"),
        # other doc: same surfaces do NOT link across docs
        _mention("d2", 0, 0, "tp53", "Gene", "x"),
    ]
    eids = ["7157", "7157", "1234", "672", "1234"]
    df = spark.createDataFrame(
        [r + (e,) for r, e in zip(rows, eids)], SCHEMA + ", entity_id string"
    )
    out = unify_doc_ids(df).collect()
    got = {(r["doc_id"], r["tok_no"], r["sent_no"]): r["entity_id"] for r in out}
    assert got[("d1", 0, 0)] == "7157"
    assert got[("d1", 1, 0)] == "7157"  # 1234 rewritten to rep
    assert got[("d1", 0, 1)] == "7157"
    assert got[("d1", 1, 1)] == "672"
    assert got[("d2", 0, 0)] == "1234"  # per-doc scope


def test_unify_tie_breaks_by_id_desc(spark):
    rows = [
        _mention("d1", 0, 0, "abc", "Disease", "x"),
        _mention("d1", 0, 1, "abc", "Disease", "x"),
    ]
    eids = ["D1", "D2"]  # equal counts -> pick max id 'D2'
    df = spark.createDataFrame(
        [r + (e,) for r, e in zip(rows, eids)], SCHEMA + ", entity_id string"
    )
    out = {r["tok_no"]: r["entity_id"] for r in unify_doc_ids(df).collect()}
    assert out == {0: "D2", 1: "D2"}


def test_canonicalize_join_path_at_size(spark):
    """Above MAP_LITERAL_MAX the broadcast-join plan is the default
    (round-1 verdict #5: 4k-entry when-chains are pathological
    expression trees) and must agree with the literal path."""
    rows = [
        _mention("1", 0, 0, "vector", "Gene", "2008(tax:10090);9999"),
        _mention("1", 0, 1, "stream", "Disease", "OMIM:600100"),
        _mention("1", 0, 2, "dup", "Disease", "MESH:C0005;D0009"),
        _mention("1", 0, 3, "bad", "Disease", "MESH:C9999"),  # invalid C
        _mention("1", 0, 4, "gene5k", "Gene", "300000"),  # via big map
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    big_transfer = {str(300000 + i): [str(600000 + i)] for i in range(5000)}
    big_transfer["2008"] = ["1008"]
    out = canonicalize_mentions(df, transfer=big_transfer)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["mention"]: r["entity_id"] for r in out.collect()}
    assert got == {
        "vector": "1008",
        "stream": "D0004",
        "dup": "C0005",
        "gene5k": "600000",
    }  # 'bad' filtered by IsValidMeSH


def test_canonicalize_literal_and_join_paths_agree(spark):
    from renet2_spark.dictionaries import (
        GENE_TRANSFER,
        MESH_C2D_VALID,
        OMIM2MESH,
    )
    from renet2_spark.operators.normalize import canonicalize_mentions_by_join

    rows = [
        _mention("1", 0, 0, "vector", "Gene", "2008(tax:10090);9999"),
        _mention("1", 0, 1, "stream", "Disease", "OMIM:600100"),
        _mention("1", 0, 2, "dup", "Disease", "MESH:C0005;D0009"),
        _mention("1", 0, 3, "slow", "Disease", "MESH:D0001"),
        _mention("2", 1, 0, "scan", "Gene", "1001"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    lit = {tuple(r) for r in canonicalize_mentions(df).collect()}
    join = {
        tuple(r)
        for r in canonicalize_mentions_by_join(
            df, GENE_TRANSFER, OMIM2MESH, MESH_C2D_VALID
        ).collect()
    }
    assert lit == join and len(lit) == 5
