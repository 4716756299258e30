"""IVF ANN scale path + LSH degenerate-bucket guard."""

from __future__ import annotations

import numpy as np
import pytest

from osm_inertial_flow_partitioner_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_dup_groups,
)
from osm_inertial_flow_partitioner_spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_ivf,
    ivf_train,
)

DIM = 16


def _clustered_embeddings(spark, n_clusters=4, per_cluster=40, seed=3):
    """Planted clusters: unit-ish centers + small noise, rounded so the
    data is exactly reproducible."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, DIM))
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + 0.05 * rng.standard_normal(DIM)
            rows.append((vid, c, [float(x) for x in np.round(v, 6)]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )


@pytest.fixture(scope="module")
def clustered(spark):
    df = _clustered_embeddings(spark).persist()
    df.count()
    return df


def _queries_from(df, ids):
    return df.filter(df.vec_id.isin(ids)).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qvec")
    )


def test_ivf_full_probe_equals_brute(spark, clustered):
    qs = _queries_from(clustered, [0, 45, 85, 125])
    brute = sorted(map(tuple, cosine_topk_brute(clustered, qs, k=5).collect()))
    ivf = sorted(
        map(
            tuple,
            cosine_topk_ivf(
                clustered, qs, k=5, n_centroids=8, nprobe=8, iters=2
            ).collect(),
        )
    )
    assert ivf == brute


def test_ivf_low_probe_recall_on_clusters(spark, clustered):
    qs = _queries_from(clustered, [0, 45, 85, 125])
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_brute(clustered, qs, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(
            clustered, qs, k=5, n_centroids=8, nprobe=2, iters=2
        ).collect()
    }
    recall = len(got & brute) / len(brute)
    assert recall >= 0.9, recall


def test_ivf_train_deterministic(spark, clustered):
    c1 = ivf_train(clustered, n_centroids=8, iters=2)
    c2 = ivf_train(clustered.repartition(7), n_centroids=8, iters=2)
    assert c1 == c2


def test_lsh_bucket_cap_bounds_planted_hot_bucket(spark):
    # 60 identical docs (one degenerate bucket) + 6 distinct docs
    rows = [(i, "the exact same boilerplate page body") for i in range(60)]
    rows += [(100 + i, f"unique document number {i} with its own words") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = lsh_candidate_pairs(docs).count()
    assert uncapped >= 60 * 59 // 2  # quadratic blowup present
    capped = lsh_candidate_pairs(docs, bucket_cap=10)
    assert capped.count() < 60 * 59 // 2
    # no pair from the hot bucket survives; distinct docs unaffected
    assert capped.filter((capped.doc1 < 60) & (capped.doc2 < 60)).count() == 0
    # and the dup-group companion represents the hot bucket linearly
    groups = {r["doc_id"]: r["n_docs"] for r in lsh_dup_groups(docs).collect()}
    assert groups.get(0) == 60
