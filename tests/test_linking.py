"""Connected components: driver union-find fast path == distributed
fixpoint (pointer-jumping label propagation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonld_spark.operators.linking import connected_components


def _edges(spark):
    # chain runs of 7, a star, a self-loop, and an isolated pair
    rows = ([(i, i + 1) for i in range(40) if i % 7 != 6]
            + [(100, 100 + k) for k in range(1, 6)]
            + [(200, 200), (300, 301)])
    return spark.createDataFrame(rows, "src long, dst long")


@pytest.mark.parametrize("threshold", [1_000_000, 0],
                         ids=["driver-union-find", "distributed-fixpoint"])
def test_components_both_paths(spark, threshold):
    cc = connected_components(_edges(spark), small_graph_edges=threshold)
    got = {r.node: r.component for r in cc.collect()}
    for i in range(41):
        assert got[i] == 7 * (i // 7)
    assert all(got[100 + k] == 100 for k in range(6))
    assert got[200] == 200
    assert got[300] == 300 and got[301] == 300


def test_paths_agree_on_string_ids(spark):
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string")
    fast = connected_components(edges).collect()
    dist = connected_components(edges, small_graph_edges=0).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, dist))
