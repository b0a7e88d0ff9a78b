"""Product quantization (webx/similarity.py pq_*) vs numpy truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webx.similarity import pq_adc_topk, pq_encode_deterministic

SF = "/root/testdata/sf0.001"
M, KSUB, DIM = 4, 8, 64
DSUB = DIM // M


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )


@pytest.fixture(scope="module")
def np_corpus(emb):
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, mat


def _np_codes(ids, mat):
    cents = mat[ids < KSUB]
    codes = np.zeros((len(ids), M), dtype=np.int64)
    for j in range(M):
        sub = mat[:, j * DSUB : (j + 1) * DSUB]
        csub = cents[:, j * DSUB : (j + 1) * DSUB]
        d = ((sub[:, None, :] - csub[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)  # numpy argmin ties → lowest index
    return codes


def test_codes_match_numpy(spark, emb, np_corpus):
    ids, mat = np_corpus
    want = _np_codes(ids, mat)
    got = {
        r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3)
        for r in pq_encode_deterministic(emb, m=M, ksub=KSUB, dim=DIM).collect()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == tuple(want[i]), vid


def test_anchor_vectors_code_to_themselves(spark, emb):
    rows = (
        pq_encode_deterministic(emb, m=M, ksub=KSUB, dim=DIM)
        .filter(F.col("vec_id") < KSUB)
        .collect()
    )
    for r in rows:
        assert (r.code_0, r.code_1, r.code_2, r.code_3) == (r.vec_id,) * M


def test_adc_topk_matches_numpy(spark, emb, np_corpus):
    ids, mat = np_corpus
    codes = _np_codes(ids, mat)
    cents = mat[ids < KSUB]
    k, n_q = 5, 4
    want = {}
    for q in range(n_q):
        qv = mat[ids == q][0]
        adc = np.zeros(len(ids))
        for j in range(M):
            qsub = qv[j * DSUB : (j + 1) * DSUB]
            csub = cents[:, j * DSUB : (j + 1) * DSUB]
            lut = ((qsub[None, :] - csub) ** 2).sum(axis=1)
            adc += lut[codes[:, j]]
        order = sorted((adc[i], ids[i]) for i in range(len(ids)) if ids[i] != q)
        want[q] = [int(nid) for _, nid in order[:k]]
    got = pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < n_q), m=M, ksub=KSUB, dim=DIM, k=k
    ).collect()
    for r in got:
        assert want[r.query_id][r.rank - 1] == r.neighbor_id


def test_encode_rejects_ragged_split():
    with pytest.raises(ValueError):
        pq_encode_deterministic(None, m=5, ksub=8, dim=64)
