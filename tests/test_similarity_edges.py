"""Edge semantics of the similarity operators: parameter validation
(silent LSH degeneration) and self-exclusion for external query id
spaces."""

from __future__ import annotations

import pytest

from jsonld_spark.operators.similarity import (ann_cosine_topk,
                                               banded_lsh_buckets,
                                               cosine_topk, ivf_cosine_topk,
                                               lsh_buckets)


def _emb(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
            (2, [0.0, 0.0, 1.0]), (3, [0.9, 0.1, 0.0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_banded_lsh_rejects_degenerate_params(spark):
    df = _emb(spark)
    # per-band plane count of 0 would bucket EVERYTHING into 0 → the
    # candidate join degenerates to the full cross product, silently
    with pytest.raises(ValueError, match="at least one plane per band"):
        banded_lsh_buckets(df, planes=[[1.0, 0.0, 0.0]] * 3, bands=4)
    with pytest.raises(ValueError, match="divide evenly"):
        banded_lsh_buckets(df, planes=[[1.0, 0.0, 0.0]] * 10, bands=4)
    with pytest.raises(ValueError, match="overflows"):
        lsh_buckets(df, planes=[[1.0, 0.0, 0.0]] * 63)


def test_exclude_self_false_keeps_id_collisions(spark):
    """Queries from an EXTERNAL id space: a corpus vector whose id
    collides with a query id is a legitimate neighbor."""
    emb = _emb(spark)
    queries = spark.createDataFrame(
        [(3, [1.0, 0.0, 0.0])], "query_id long, query_vec array<double>")
    # query id 3 collides with corpus vec 3 (cosine 0.9938) — the default
    # drops it, exclude_self=False keeps it
    got_default = {r.neighbor_id for r in
                   cosine_topk(emb, queries, k=4).collect()}
    got_external = {r.neighbor_id for r in
                    cosine_topk(emb, queries, k=4,
                                exclude_self=False).collect()}
    assert 3 not in got_default
    assert 3 in got_external

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    ivf = ivf_cosine_topk(emb, queries, cents, k=4, nprobe=3,
                          exclude_self=False)
    assert 3 in {r.neighbor_id for r in ivf.collect()}

    planes = [[1.0, 0.0, 0.0]]  # one plane: query and vec 3 share a bucket
    ann = ann_cosine_topk(emb, queries, planes, k=4, exclude_self=False)
    assert 3 in {r.neighbor_id for r in ann.collect()}


def test_train_ivf_centroids_matches_numpy_kmeans(spark):
    """Distributed spherical k-means must equal a numpy implementation
    with the identical deterministic init and iteration count."""
    import numpy as np

    from jsonld_spark.operators.similarity import train_ivf_centroids

    rng = np.random.RandomState(3)
    centers = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    pts = np.vstack([c + rng.normal(0, 0.05, (30, 3)) for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id long, embedding array<double>")

    got = train_ivf_centroids(df, k=3, iters=4)

    # replicate: init = k smallest xxhash64 of the array's string form
    from pyspark.sql import functions as F
    init_rows = (df.select("embedding")
                 .orderBy(F.xxhash64(F.col("embedding").cast("string")))
                 .limit(3).collect())

    def unit(v):
        n = np.linalg.norm(v)
        return v / n if n > 0 else v
    cents = np.array([unit(np.array(r[0])) for r in init_rows])
    for _ in range(4):
        labels = np.argmax(pts @ cents.T, axis=1)
        for i in range(3):
            if (labels == i).any():
                cents[i] = unit(pts[labels == i].mean(axis=0))
    assert np.allclose(np.array(got), cents, atol=1e-9)

    # trained codebook separates the three true clusters
    from jsonld_spark.operators.similarity import ivf_assign
    lists = ivf_assign(df, got).select("vec_id", "list_id").collect()
    by_cluster = {}
    for r in lists:
        by_cluster.setdefault(r.vec_id // 30, set()).add(r.list_id)
    assert all(len(v) == 1 for v in by_cluster.values())
    assert len(set().union(*by_cluster.values())) == 3


def test_lsh_geometry_math():
    from jsonld_spark.operators.similarity import lsh_geometry
    import math
    import pytest as _pytest
    p, b = lsh_geometry(0.4, target_recall=0.55)
    prob = 1 - math.acos(0.4) / math.pi
    assert 1 - (1 - prob ** p) ** b >= 0.55      # meets target
    assert b * 0.5 ** p <= 0.25                  # within budget
    assert b <= 16                               # band-row bound
    p2, b2 = lsh_geometry(0.95)
    prob2 = 1 - math.acos(0.95) / math.pi
    assert 1 - (1 - prob2 ** p2) ** b2 >= 0.9
    assert b2 * 0.5 ** p2 < 0.01                 # selective regime
    with _pytest.raises(ValueError, match="threshold"):
        lsh_geometry(1.5)
