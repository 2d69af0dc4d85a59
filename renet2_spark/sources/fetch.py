"""Executor-parallel document fetching (S1/S2 shape).

Reference: download_abs/download_doc fetch one PubTator/BioC document
per id over HTTP (src/renet2/download_data.py:10-75) and
download_from_lst_hd fans the id list over a multiprocessing.Pool with
hit/miss/empty accounting (download_data.py:77-109).

Spark-first re-expression: the id table partitions across executors
and each Arrow batch is fetched inside mapInPandas — executor
parallelism replaces the process pool, and the hit/miss accounting is
an ordinary grouped aggregation over the returned status column
(download_data.py:103-107). The TRANSPORT is injected (a callable
id -> (status, body)) so the engine is testable without network and
swappable for urllib/requests/S3 in production; this sandbox has no
network, so no default HTTP transport is wired in.

Scale notes: fetches are embarrassingly parallel; the only knobs are
partition count (ids.repartition(n) bounds concurrent connections) and
Arrow batch size. A polite production transport rate-limits per
executor — the reference used a 3-process pool for the same reason
(download_data.py:77-86).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUS_HIT = "hit"      # download_data.py hit_list
STATUS_MISS = "miss"    # request failed
STATUS_EMPTY = "empty"  # fetched but no content

_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def fetch_documents(
    ids: DataFrame,
    transport: Callable[[str], tuple[str, str]],
    partitions: int | None = None,
) -> DataFrame:
    """ids(doc_id) -> (doc_id, status, body) via the injected transport,
    executed per Arrow batch on executors."""
    src = ids.select(F.col("doc_id").cast("string").alias("doc_id"))
    if partitions:
        src = src.repartition(partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "status": [], "body": []}
            for doc_id in pdf["doc_id"]:
                try:
                    status, body = transport(doc_id)
                except Exception:
                    status, body = STATUS_MISS, ""
                out["doc_id"].append(doc_id)
                out["status"].append(status)
                out["body"].append(body)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=_FETCH_SCHEMA)


def fetch_accounting(fetched: DataFrame) -> DataFrame:
    """(status, n) hit/miss/empty counts (download_data.py:103-107)."""
    return fetched.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n")
    )
