"""PageRank (operators/graph.py) — checked against an independent
dense-vector reference plus structural properties."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark.operators.graph import pagerank  # noqa: E402


def _ref_pagerank(edges, n_iters=10, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = [0] * n
    for a, _ in edges:
        out[idx[a]] += 1
    r = [1.0 / n] * n
    for _ in range(n_iters):
        nxt = [0.0] * n
        dangling = sum(r[i] for i in range(n) if out[i] == 0)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / out[idx[a]]
        for i in range(n):
            nxt[i] += (1 - d) / n + d * dangling / n
        r = nxt
    return dict(zip(nodes, r))


EDGES = [
    ("a.com", "hub.com"), ("b.com", "hub.com"), ("c.com", "hub.com"),
    ("hub.com", "a.com"), ("a.com", "b.com"), ("d.com", "a.com"),
    ("e.com", "d.com"),  # e has no inlinks; hub is the authority
]


def test_matches_independent_reference(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iters=10).collect()}
    want = _ref_pagerank(EDGES, n_iters=10)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], rel=1e-9), node


def test_authority_ordering_and_mass_conservation(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    ranks = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    # hub (3 inlinks) and a (hub's sole outlink target) are the top 2;
    # the no-inlink nodes c and e share the floor rank
    top2 = sorted(ranks, key=ranks.get, reverse=True)[:2]
    assert set(top2) == {"hub.com", "a.com"}
    floor = min(ranks.values())
    assert ranks["c.com"] == pytest.approx(floor, rel=1e-12)
    assert ranks["e.com"] == pytest.approx(floor, rel=1e-12)


def test_dangling_node_mass_redistributes(spark):
    # b is a pure sink (no outlinks): its mass must flow back uniformly
    # instead of leaking — ranks still sum to 1
    df = spark.createDataFrame([("a", "b"), ("c", "b")], ["src", "dst"])
    ranks = {r["node"]: r["rank"] for r in pagerank(df, n_iters=12).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks["b"] > ranks["a"] == pytest.approx(ranks["c"], rel=1e-9)


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    a = {r["node"]: r["rank"]
         for r in pagerank(df.repartition(7), n_iters=6).collect()}
    b = {r["node"]: r["rank"]
         for r in pagerank(df.coalesce(1), n_iters=6).collect()}
    for node in a:
        assert a[node] == pytest.approx(b[node], rel=1e-12), node


def test_crawl_links_to_host_rank_composition(spark):
    # the full link-graph curation story: WARC → extract_links_df →
    # host-level edges → pagerank; the thrice-linked host dominates
    from pyspark.sql import functions as F

    from drugbankner_spark.operators import web as W
    from drugbankner_spark.sources import warc_source as WS

    def page(uri, hrefs):
        body = ("<html><body>" + "".join(
            f'<a href="{h}">x</a>' for h in hrefs) + "</body></html>"
        ).encode()
        return WS.encode_warc_record(
            "response", uri, WS.encode_http_response(body)
        )

    archive = WS.encode_warc([
        page("https://a.com/1", ["https://hub.io/x"]),
        page("https://b.org/1", ["https://hub.io/y", "https://a.com/2"]),
        page("https://c.net/1", ["https://hub.io/z"]),
    ])
    archives = spark.createDataFrame(
        [("mem://l.warc", bytearray(archive))],
        "path string, content binary",
    )
    recs = WS.warc_records(archives).filter(
        F.col("warc_type") == "response"
    )
    edges = W.extract_links_df(recs).select(
        W.url_host("page_uri").alias("src"),
        W.url_host("href").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    ranks = {r["node"]: r["rank"]
             for r in pagerank(edges, n_iters=8).collect()}
    assert max(ranks, key=ranks.get) == "hub.io"


def test_personalized_pagerank_seed_affinity(spark):
    # round 7: teleport to seeds — a node unreachable from the seeds
    # converges to 0; seeds retain mass; totals sum to ~1 over the
    # reachable component.
    from drugbankner_spark.operators.graph import personalized_pagerank

    # chain 1->2->3, island 9->10 (unreachable from seed 1)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 10)], "src long, dst long"
    )
    ranks = {r["node"]: r["rank"] for r in personalized_pagerank(
        edges, [1], n_iters=20
    ).collect()}
    assert ranks[9] == 0.0 and ranks[10] == 0.0
    assert ranks[1] > 0.1 and ranks[2] > 0.0 and ranks[3] > 0.0
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    # seed bias: with seed 3 (a sink), mass concentrates there
    r3 = {r["node"]: r["rank"] for r in personalized_pagerank(
        edges, [3], n_iters=20
    ).collect()}
    assert r3[3] > 0.9 and r3[1] == 0.0


def test_personalized_pagerank_requires_seeds(spark):
    import pytest

    from drugbankner_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, [])
