"""CLI entry points (reference `renet2 <submodule>` analogue)."""

import json
import shutil
import tempfile

from tests.conftest import SF_SMOKE


def test_cli_predict_tsv(spark, capsys):
    # reuse the pytest session's SparkSession (getOrCreate in cli)
    from renet2_spark.cli import main

    out = tempfile.mkdtemp(prefix="cli_") + "/gda"
    rc = main([
        "predict", "--input", f"{SF_SMOKE}/documents.parquet",
        "--output", out, "--format", "tsv",
    ])
    assert rc == 0
    df = spark.read.option("sep", "\t").option("header", True).csv(out)
    assert df.count() > 0
    assert df.columns == ["pmid", "geneId", "diseaseId", "g_name", "d_name", "prob_avg"]


def test_cli_parse_and_normalize_roundtrip(spark):
    from renet2_spark.cli import main

    doc = {
        "pmid": "7",
        "passages": [
            {"infons": {"type": "title", "section_type": "TITLE"},
             "text": "scan and slow", "offset": 0, "media_ref": None},
        ],
    }
    d = tempfile.mkdtemp(prefix="cli_")
    with open(d + "/in.jsonl", "w") as f:
        f.write(json.dumps(doc) + "\n")
    assert main(["parse_data", "--input", d + "/in.jsonl",
                 "--output", d + "/spans"]) == 0
    spans = spark.read.parquet(d + "/spans")
    assert spans.count() == 1
    shutil.rmtree(d, ignore_errors=True)


def test_cli_evaluate(spark, capsys):
    from renet2_spark.cli import main

    d = tempfile.mkdtemp(prefix="cli_")
    rows = [("1", "g1", "d1"), ("2", "g2", "d2")]
    df = spark.createDataFrame(rows, "doc_id string, gene_id string, disease_id string")
    df.write.parquet(d + "/pred")
    df.limit(1).write.parquet(d + "/gold")
    assert main(["evaluate", "--pred", d + "/pred", "--gold", d + "/gold"]) == 0
    outp = capsys.readouterr().out
    assert "precision=0.5" in outp and "recall=1.0" in outp
    shutil.rmtree(d, ignore_errors=True)
