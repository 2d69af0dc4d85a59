"""Curation operators: packing invariants, decontamination semantics,
deterministic sampling properties (operators/curation.py)."""

from pyspark.sql import functions as F

from renet2_spark.operators import curation as cur
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_pack_sequences_invariants(spark):
    budget = 64
    rows = cur.pack_sequences(_docs(spark), budget=budget).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert 0 <= r["bin_offset"] < budget
        assert r["bin_id"] == r["start_offset"] // budget
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: int(r["doc_id"]))
        # contiguous concat: each doc starts where the previous ended
        off = 0
        for r in rs:
            assert r["start_offset"] == off
            off += r["n_tokens"]
        # bin ids are monotone within a source
        bins = [r["bin_id"] for r in rs]
        assert bins == sorted(bins)


def test_pack_sequences_bins_fill(spark):
    """Every bin except a source's last must be 'full': the next doc in
    the source starts in the same or next bin (no empty bins)."""
    budget = 64
    rows = cur.pack_sequences(_docs(spark), budget=budget).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: int(r["doc_id"]))
        for a, b in zip(rs, rs[1:]):
            # concat semantics: no gap -> bin ids never skip by more
            # than the tokens of the doc spanning them allow
            assert b["bin_id"] >= a["bin_id"]
            assert (
                b["bin_id"] - a["bin_id"]
                <= (a["n_tokens"] // budget) + 1
            )


def test_decontaminate_flags_planted_overlap(spark):
    docs = spark.createDataFrame(
        [
            ("1", "a b c d e f g h", "en", "s"),
            ("2", "z y x w v u t s", "en", "s"),
        ],
        "doc_id string, text string, lang string, source string",
    )
    ev = spark.createDataFrame(
        [("9", "q q a b c d e f q q", "en", "s")],
        "doc_id string, text string, lang string, source string",
    )
    got = {r["doc_id"]: r for r in cur.decontaminate(docs, ev).collect()}
    # doc 1 shares 'a b c d e' and 'b c d e f' with the eval doc
    assert got["1"]["n_contaminated"] == 2
    assert got["1"]["n_sh"] == 4
    assert abs(got["1"]["contamination"] - 0.5) < 1e-9
    assert got["2"]["n_contaminated"] == 0
    assert got["2"]["contamination"] == 0.0


def test_sample_hash_deterministic_and_stable(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in cur.sample_hash(docs, pct=20.0).collect()}
    b = {r["doc_id"] for r in cur.sample_hash(docs, pct=20.0).collect()}
    assert a == b and len(a) > 0
    # membership is per-doc: a larger pct strictly grows the sample
    big = {r["doc_id"] for r in cur.sample_hash(docs, pct=50.0).collect()}
    assert a <= big
    # a different salt draws a different sample
    c = {r["doc_id"] for r in cur.sample_hash(docs, pct=20.0, salt="x").collect()}
    assert c != a
    # roughly the requested rate (binomial, 500 docs, generous bounds)
    n = docs.count()
    assert 0.10 * n <= len(a) <= 0.32 * n
