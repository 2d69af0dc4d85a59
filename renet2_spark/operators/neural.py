"""Neural relation scorer: the reference's CNN+BiGRU document
classifier ensemble re-expressed as Arrow-batch NumPy inference.

Reference architecture (src/renet2/model.py:289-450): word embedding
concat frozen feature embedding (model.py:309-312) -> per-sentence
Conv1d over tokens + max-pool -> sentence vectors -> bidirectional GRU
over sentences -> FC -> sigmoid; 10 independently-initialized models
(src/renet2/predict.py:63-100), each scored over the whole dataset in
a separate sequential pass with a TSV round-trip.

Spark-first restructure (the big algorithmic win, SURVEY §4): ALL 10
models are resident in the Python worker and applied to each Arrow
batch in one pass — the corpus is read once, not 10 times. Weights are
deterministic (seeded per model id), executor-local singletons (built
on first batch, reused across batches — the reference's
"load checkpoint once" predict.py:63-72 analogue).

Input tensor semantics (reference raw_handler.py:51-61 padding +
sequence_utils.py feature codes): per pair, token-id matrix [S, T] and
feature-code matrix [S, T], S<=32 sentences, T<=54 tokens; codes
{0:plain, 1:other-disease, 2:other-gene, 3:joint, 4:target-disease,
5:target-gene, 6:target-joint}. Batches pad to the batch max S/T with
masking, so results are independent of batching/partitioning.

Scale: scoring is embarrassingly parallel; Arrow batch size is the
only memory knob (spark.sql.execution.arrow.maxRecordsPerBatch). No
shuffle is introduced — the UDF runs in the same stage as the
pair-feature join output.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..dictionaries import VOCAB_SIZE, WORD_INDEX

N_MODELS = 10
MAX_SENTS = 32  # reference abstract-mode snt_n (README.md:216)
MAX_TOKENS = 54  # reference fix_token_n (predict.py:291-294)
EMB_DIM = 8
FEAT_DIM = 4
N_FEAT_CODES = 7
CONV_FILTERS = 8
CONV_K = 3
GRU_HIDDEN = 4
SEED_BASE = 1000


def model_weights(i: int) -> dict[str, np.ndarray]:
    """Deterministic seeded weights for ensemble member i (stand-in
    for the reference's trained checkpoints, predict.py:63-72)."""
    rng = np.random.RandomState(SEED_BASE + i)
    d_in = EMB_DIM + FEAT_DIM
    h = GRU_HIDDEN
    return {
        "emb_w": rng.randn(VOCAB_SIZE, EMB_DIM).astype(np.float64) * 0.3,
        "emb_f": rng.randn(N_FEAT_CODES, FEAT_DIM).astype(np.float64) * 0.3,
        "conv_w": rng.randn(CONV_K * d_in, CONV_FILTERS) * 0.2,
        "conv_b": rng.randn(CONV_FILTERS) * 0.1,
        # one GRU per direction: [update z, reset r, candidate n]
        "gru_wx_f": rng.randn(CONV_FILTERS, 3 * h) * 0.3,
        "gru_wh_f": rng.randn(h, 3 * h) * 0.3,
        "gru_b_f": rng.randn(3 * h) * 0.1,
        "gru_wx_b": rng.randn(CONV_FILTERS, 3 * h) * 0.3,
        "gru_wh_b": rng.randn(h, 3 * h) * 0.3,
        "gru_b_b": rng.randn(3 * h) * 0.1,
        "fc_w": rng.randn(2 * h) * 0.5,
        "fc_b": rng.randn() * 0.1,
    }


_WEIGHTS: list[dict[str, np.ndarray]] | None = None


def all_weights() -> list[dict[str, np.ndarray]]:
    global _WEIGHTS
    if _WEIGHTS is None:
        _WEIGHTS = [model_weights(i) for i in range(N_MODELS)]
    return _WEIGHTS


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _gru_dir(x, mask, wx, wh, b, reverse: bool):
    """Masked GRU over sentence axis. x: [B, S, F], mask: [B, S]."""
    B, S, _ = x.shape
    h = np.zeros((B, GRU_HIDDEN))
    steps = range(S - 1, -1, -1) if reverse else range(S)
    for s in steps:
        g = x[:, s, :] @ wx + h @ wh + b  # [B, 3h]
        z = _sigmoid(g[:, :GRU_HIDDEN])
        r = _sigmoid(g[:, GRU_HIDDEN : 2 * GRU_HIDDEN])
        n = np.tanh(
            x[:, s, :] @ wx[:, 2 * GRU_HIDDEN :]
            + (r * h) @ wh[:, 2 * GRU_HIDDEN :]
            + b[2 * GRU_HIDDEN :]
        )
        h_new = (1 - z) * n + z * h
        m = mask[:, s : s + 1]
        h = m * h_new + (1 - m) * h
    return h  # [B, h]


def forward(tok: np.ndarray, feat: np.ndarray, w: dict) -> np.ndarray:
    """One model forward. tok/feat: int [B, S, T] (0 = pad). -> [B]."""
    B, S, Tk = tok.shape
    tmask = (tok > 0).astype(np.float64)  # [B,S,T]
    smask = (tmask.sum(axis=2) > 0).astype(np.float64)  # [B,S]
    x = np.concatenate([w["emb_w"][tok], w["emb_f"][feat]], axis=-1)
    x *= tmask[..., None]
    d_in = x.shape[-1]
    # conv over tokens, kernel 3, valid padding via im2col
    if Tk < CONV_K:
        pad = np.zeros((B, S, CONV_K - Tk, d_in))
        x = np.concatenate([x, pad], axis=2)
        Tk = CONV_K
    windows = np.stack(
        [x[:, :, j : Tk - CONV_K + 1 + j, :] for j in range(CONV_K)], axis=3
    )  # [B,S,T',K,d]
    Tp = windows.shape[2]
    flat = windows.reshape(B, S, Tp, CONV_K * d_in)
    conv = np.maximum(flat @ w["conv_w"] + w["conv_b"], 0.0)  # [B,S,T',F]
    # mask positions whose window is fully padding, then max-pool
    wmask = tmask[:, :, :Tp]  # window valid iff first token valid
    conv = np.where(wmask[..., None] > 0, conv, -np.inf)
    sent = conv.max(axis=2)  # [B,S,F]
    sent = np.where(np.isfinite(sent), sent, 0.0)
    hf = _gru_dir(sent, smask, w["gru_wx_f"], w["gru_wh_f"], w["gru_b_f"], False)
    hb = _gru_dir(sent, smask, w["gru_wx_b"], w["gru_wh_b"], w["gru_b_b"], True)
    out = np.concatenate([hf, hb], axis=1) @ w["fc_w"] + w["fc_b"]
    return _sigmoid(out)  # [B]


FEATURE_OTHER_DISEASE = 1
FEATURE_OTHER_GENE = 2
FEATURE_TARGET_DISEASE = 4
FEATURE_TARGET_GENE = 5


def build_pair_tensors(
    tok_ids: list, ments: list, gene_id: str, disease_id: str
) -> tuple[np.ndarray, np.ndarray]:
    """Per-pair [S, T] token-id and feature-code matrices (reference
    sequence_utils.py:325-349 pair-specific recode)."""
    S = min(len(tok_ids), MAX_SENTS)
    Tk = min(max((len(s) for s in tok_ids[:S]), default=1), MAX_TOKENS)
    tok = np.zeros((S, Tk), dtype=np.int64)
    feat = np.zeros((S, Tk), dtype=np.int64)
    for si in range(S):
        row = tok_ids[si][:Tk]
        tok[si, : len(row)] = row
    if ments is None:
        ments = []
    for m in ments:
        s, t = m["sent_no"], m["tok_no"]
        if s >= S or t >= Tk:
            continue
        if m["type"] == "Gene":
            code = (
                FEATURE_TARGET_GENE
                if m["entity_id"] == gene_id
                else FEATURE_OTHER_GENE
            )
        else:
            code = (
                FEATURE_TARGET_DISEASE
                if m["entity_id"] == disease_id
                else FEATURE_OTHER_DISEASE
            )
        feat[s, t] = code
    return tok, feat


def score_batch(pdf: pd.DataFrame) -> np.ndarray:
    """[B, N_MODELS] ensemble probabilities for a pandas batch with
    columns tok_ids, ments, gene_id, disease_id."""
    B = len(pdf)
    tensors = [
        build_pair_tensors(t, m, g, d)
        for t, m, g, d in zip(
            pdf["tok_ids"], pdf["ments"], pdf["gene_id"], pdf["disease_id"]
        )
    ]
    S = max(t[0].shape[0] for t in tensors)
    Tk = max(t[0].shape[1] for t in tensors)
    tok = np.zeros((B, S, Tk), dtype=np.int64)
    feat = np.zeros((B, S, Tk), dtype=np.int64)
    for i, (tk, ft) in enumerate(tensors):
        tok[i, : tk.shape[0], : tk.shape[1]] = tk
        feat[i, : ft.shape[0], : ft.shape[1]] = ft
    return np.stack(
        [forward(tok, feat, w) for w in all_weights()], axis=1
    )  # [B, N]


def doc_tensors(sentences: DataFrame, mentions: DataFrame) -> DataFrame:
    """(doc_id, tok_ids array<array<int>>, ments array<struct>) — one
    row per doc; built natively (map-literal vocab lookup, zero
    Python), shared by every pair of the doc."""
    vocab_items = []
    for k, v in WORD_INDEX.items():
        vocab_items += [F.lit(k), F.lit(v)]
    vocab = F.create_map(*vocab_items)
    oov = F.lit(WORD_INDEX["[X]"])
    ids = F.transform(
        F.split(F.col("sentence"), " "),
        lambda w: F.coalesce(vocab[w], oov).cast("int"),
    )
    toks = (
        sentences.select("doc_id", "sent_no", ids.alias("ids"))
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("sent_no", "ids"))),
                lambda s: s["ids"],
            ).alias("tok_ids")
        )
    )
    ments = mentions.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("sent_no", "tok_no", "type", "entity_id")
        ).alias("ments")
    )
    return toks.join(ments, "doc_id", "left")


def neural_score_pairs(
    pairs: DataFrame, sentences: DataFrame, mentions: DataFrame
) -> DataFrame:
    """pairs (doc_id, gene_id, disease_id, ...) -> + probs
    array<double> of the 10-model ensemble; plugs into
    scorer.ensemble_vote unchanged."""
    tensors = doc_tensors(sentences, mentions)
    joined = pairs.join(tensors, "doc_id")
    in_schema = joined.schema
    out_schema = T.StructType(
        [f for f in in_schema.fields if f.name not in ("tok_ids", "ments")]
        + [T.StructField("probs", T.ArrayType(T.DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            probs = score_batch(pdf)
            out = pdf.drop(columns=["tok_ids", "ments"])
            out["probs"] = [list(map(float, row)) for row in probs]
            yield out

    return joined.mapInPandas(run, schema=out_schema)
