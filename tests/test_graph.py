"""Connected-components dedup clustering (functions/graph.py).

The oracle gate (q65) proves end-to-end parity on hash-bucket graphs
whose star edges all point one hop from the cluster min; these tests pin
the properties that fixture cannot reach: multi-hop label propagation on
adverse id orderings, star-vs-clique connectivity equivalence, the
non-convergence guard, and singleton widening via explicit vertices.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from baskerville_spark.functions.graph import (
    connected_components,
    dedup_clusters,
    star_edges,
)


def _labels(df) -> dict[int, int]:
    return {r["id"]: r["cluster_id"] for r in df.collect()}


def test_path_graph_needs_multiple_rounds(spark):
    # Path 9-7-5-3-1 with the min at the far end: label 1 must walk the
    # path hop by hop, so convergence takes >1 round — the regime the
    # q65 star-edge fixture (diameter 2) never enters.
    verts = spark.createDataFrame([(9,), (7,), (5,), (3,), (1,)], ["id"])
    edges = spark.createDataFrame(
        [(9, 7), (7, 5), (5, 3), (3, 1)], ["src", "dst"]
    )
    out, iters = connected_components(verts, edges, return_iters=True)
    assert _labels(out) == {1: 1, 3: 1, 5: 1, 7: 1, 9: 1}
    assert iters > 2  # 4 hops of propagation + 1 confirming round


def test_two_components_and_isolated_vertex(spark):
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], ["id"])
    edges = spark.createDataFrame(
        [(2, 4), (4, 6), (1, 3), (3, 5)], ["src", "dst"]
    )
    got = _labels(connected_components(verts, edges))
    assert got == {1: 1, 3: 1, 5: 1, 2: 2, 4: 2, 6: 2, 7: 7}


def test_star_edges_match_clique_connectivity(spark):
    # Buckets {1,5,9} and {9,12} chain through 9; star edges must yield
    # the same components as the explicit all-pairs cliques.
    membership = spark.createDataFrame(
        [(1, "a"), (5, "a"), (9, "a"), (9, "b"), (12, "b"), (20, "c")],
        ["id", "bucket"],
    )
    verts = membership.select("id").distinct()
    stars = star_edges(membership)
    # star edge count is linear: (3-1) + (2-1) + 0 singleton
    assert stars.count() == 3
    cliques = spark.createDataFrame(
        [(1, 5), (1, 9), (5, 9), (9, 12)], ["src", "dst"]
    )
    assert _labels(connected_components(verts, stars)) == _labels(
        connected_components(verts, cliques)
    )


def test_nonconvergence_raises(spark):
    verts = spark.createDataFrame([(9,), (7,), (5,), (3,), (1,)], ["id"])
    edges = spark.createDataFrame(
        [(9, 7), (7, 5), (5, 3), (3, 1)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(verts, edges, max_iters=2)


def test_dedup_clusters_vertices_widen_to_singletons(spark):
    membership = spark.createDataFrame(
        [(1, "x"), (2, "x")], ["doc", "bucket"]
    )
    verts = spark.createDataFrame([(1,), (2,), (3,)], ["doc"])
    out = dedup_clusters(
        membership, id_col="doc", bucket_col="bucket", vertices=verts
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[3]["cluster_id"] == 3 and rows[3]["cluster_size"] == 1
    assert rows[3]["is_canonical"] is True
    assert rows[1]["cluster_size"] == 2 and rows[2]["cluster_id"] == 1
    assert rows[2]["is_canonical"] is False
    # canonical survivors: exactly one per cluster
    assert (
        out.where("is_canonical").count()
        == out.select("cluster_id").distinct().count()
    )
