"""PageRank: distributed DataFrame loop vs single-process numpy oracle."""
import pytest

from sparkharvester.graph import host_edges_synthetic, pagerank, pagerank_numpy


def test_pagerank_matches_numpy_oracle(spark):
    n = 60
    edges = host_edges_synthetic(spark, n_hosts=n, fanout=3)
    edge_list = [(r["src"], r["dst"]) for r in edges.collect()]
    expected = pagerank_numpy(edge_list, n, iterations=12)

    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=12).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for node, r in got.items():
        assert r == pytest.approx(expected[node], rel=1e-9), node


def test_pagerank_dangling_nodes(spark):
    # node 2 has no out-links: its mass must redistribute, sum stays 1
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=20).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[2] > got[1] > got[0]
