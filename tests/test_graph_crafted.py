"""Closed-form graph checks on a CRAFTED co-purchase graph (the
oracle gate proves Spark==DuckDB on driver data; these prove both
equal textbook values a human can verify by hand).

Construction: one URGENT 2-item order per desired edge, so the
basket self-join yields exactly the chosen graph.  The graph:

- K6 clique on parts 101..106 (each degree 5 inside the clique);
- node 301 adjacent to 101..104 (degree 4 — dies in peel round 1,
  and its removal drops 101..104 from degree 6 back to 5, so the
  fixpoint needs the SECOND round to confirm stability);
- pendant chain 106-201-202 (degrees 1-2 — dies in round 1).

Known values: 9 nodes, 21 edges, 26 triangles (C(6,3)=20 in the
clique + C(4,2)=6 through 301), 5-core = exactly the K6 at degree 5,
and Jaccard(101,102) = 5/(6+6-5) = 5/7 (common neighbors: the other
four clique members + 301).
"""

from __future__ import annotations

import os

import pytest

from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries

all_queries()

_CLIQUE = [101, 102, 103, 104, 105, 106]
_EDGES = (
    [(a, b) for i, a in enumerate(_CLIQUE) for b in _CLIQUE[i + 1:]]
    + [(101, 301), (102, 301), (103, 301), (104, 301)]
    + [(106, 201), (201, 202)]
)


@pytest.fixture(scope="module")
def crafted_graph_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("crafted_graph")
    orders = spark.createDataFrame(
        [(i, "1-URGENT") for i in range(len(_EDGES))],
        "o_orderkey long, o_orderpriority string")
    lineitem = spark.createDataFrame(
        [(i, p) for i, (a, b) in enumerate(_EDGES) for p in (a, b)],
        "l_orderkey long, l_partkey long")
    for name, df in (("orders", orders), ("lineitem", lineitem)):
        (df.coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(str(d), f"{name}.parquet")))
    return str(d)


def test_triangle_count_closed_form(spark, crafted_graph_sf_dir):
    row = (REGISTRY["graph_triangle_count"]
           .spark(spark, crafted_graph_sf_dir).collect()[0])
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (9, 21, 26)


def test_kcore_fixpoint_is_exactly_the_clique(spark,
                                              crafted_graph_sf_dir):
    rows = (REGISTRY["graph_kcore_fixpoint"]
            .spark(spark, crafted_graph_sf_dir).collect())
    assert {r.node for r in rows} == set(_CLIQUE)
    assert all(r.core_deg == 5 for r in rows)


def test_kcore_peel_trajectory(spark, crafted_graph_sf_dir):
    """Round 1 must peel 201/202/301 (degrees 2/1/4) and keep the
    clique; 101..104 start at degree 6 (the 301 edges) and settle to
    5 after 301 leaves."""
    got = {r.node: r for r in REGISTRY["graph_kcore_peel"]
           .spark(spark, crafted_graph_sf_dir).collect()}
    assert got[301].deg0 == 4 and got[301].deg1 is None
    assert got[201].deg0 == 2 and got[201].deg1 is None
    assert got[101].deg0 == 6 and got[101].deg1 == 5 \
        and got[101].deg2 == 5
    assert got[105].deg0 == 5 and got[105].deg2 == 5


def test_jaccard_closed_form(spark, crafted_graph_sf_dir):
    rows = {(r.part_a, r.part_b): r
            for r in REGISTRY["graph_jaccard_neighbors"]
            .spark(spark, crafted_graph_sf_dir).collect()}
    r = rows[(101, 102)]
    # common: 103..106 and 301 = 5; degrees 6 and 6.
    assert r.n_common == 5 and (r.deg_a, r.deg_b) == (6, 6)
    assert r.jaccard == round(5 / 7, 6)
    # the pendant edge (201, 202) has no common neighbor: absent.
    assert (201, 202) not in rows


#: Two triangles {1,2,3}, {4,5,6} joined by the bridge 3-4, all edge
#: weights 1 (each pair co-occurs in exactly one URGENT order).
#: Hand-computed merge decisions (m2 = 14, gain = 14*w - k_u*k_v):
#: 1->2 (gain 10), 2->1 (10), 3->1 (tie 8 vs neighbor 2, lower id
#: wins), 4->5 (tie 8 vs 6), 5->6 (10), 6->5 (10).  Phase-1
#: communities: {2:[1], 1:[2,3], 5:[4,6], 6:[5]} with k = 2,5,5,2.
#: Contracted cross edges: 2-1 (w2), 1-5 (w1), 5-6 (w2); phase-2
#: merges 2<->1 and 5<->6 (gain 14*2 - 2*5 = 18), the bridge's
#: gain 14*1 - 5*5 = -11 keeps the halves apart.
_TRI_EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]


@pytest.fixture(scope="module")
def two_triangle_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("two_triangles")
    orders = spark.createDataFrame(
        [(i, "1-URGENT") for i in range(len(_TRI_EDGES))],
        "o_orderkey long, o_orderpriority string")
    lineitem = spark.createDataFrame(
        [(i, p) for i, (a, b) in enumerate(_TRI_EDGES) for p in (a, b)],
        "l_orderkey long, l_partkey long")
    for name, df in (("orders", orders), ("lineitem", lineitem)):
        (df.coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(str(d), f"{name}.parquet")))
    return str(d)


def test_louvain_merge_closed_form(spark, two_triangle_sf_dir):
    got = {r.node: (r.k_node, r.community, r.gain_num)
           for r in REGISTRY["graph_louvain_merge_step"]
           .spark(spark, two_triangle_sf_dir).collect()}
    assert got == {
        1: (2, 2, 10), 2: (2, 1, 10), 3: (3, 1, 8),
        4: (3, 5, 8), 5: (2, 6, 10), 6: (2, 5, 10),
    }


def test_louvain_contract_closed_form(spark, two_triangle_sf_dir):
    got = {r.node: (r.k_node, r.community, r.gain_num)
           for r in REGISTRY["graph_louvain_contract_step"]
           .spark(spark, two_triangle_sf_dir).collect()}
    # Each half collapses into one community; the weak bridge
    # (gain 14 - 25 = -11) never merges the halves.
    assert got == {
        1: (5, 2, 18), 2: (2, 1, 18), 5: (5, 6, 18), 6: (2, 5, 18),
    }


def test_pagerank_closed_form(spark, tmp_path_factory):
    """Scaled-integer PageRank on a 3-edge bipartite graph: customers
    {1, 2} -> suppliers {10, 20} with c1 -> {10, 20}, c2 -> {10}.
    Contributions: floor(1e12/2) from c1, 1e12 from c2; damped score =
    1.5e11 + 85%*sum — exact integers a human can check."""
    d = tmp_path_factory.mktemp("crafted_pr")
    orders = spark.createDataFrame(
        [(1, 1), (2, 2)], "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "l_orderkey long, l_suppkey long")
    for name, df in (("orders", orders), ("lineitem", lineitem)):
        (df.coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(str(d), f"{name}.parquet")))
    got = {r.node: r.pagerank_scaled
           for r in REGISTRY["graph_pagerank_iter"]
           .spark(spark, str(d)).collect()}
    assert got == {
        10: 150_000_000_000 + 85 * (500_000_000_000
                                    + 1_000_000_000_000) // 100,
        20: 150_000_000_000 + 85 * 500_000_000_000 // 100,
    }


def test_louvain_fixpoint_converges_to_the_triangles(
        spark, two_triangle_sf_dir):
    """Full Louvain with the mutual-selection symmetry break: level 1
    collapses each triangle into its smallest member's community (the
    1-2 and 5-6 mutual pairs move only the larger id; 3 and 4 follow
    their best neighbor), level 2 sees only the weak bridge (gain
    14*1 - 7*7 < 0) and moves nobody — textbook two communities."""
    rows = (REGISTRY["graph_louvain_fixpoint"]
            .spark(spark, two_triangle_sf_dir).collect())
    got = {r.node: (r.n_members, r.k_total) for r in rows}
    assert got == {1: (3, 7), 5: (3, 7)}


def test_pagerank_fixpoint_matches_integer_replay(spark,
                                                  crafted_graph_sf_dir):
    """The scaled-integer recursion replayed in plain Python over the
    same crafted edges (exact int arithmetic, same convergence rule)
    must reproduce every rank bit-for-bit."""
    und = [(a, b) for a, b in _EDGES] + [(b, a) for a, b in _EDGES]
    outdeg: dict[int, int] = {}
    for u, _v in und:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {u: 1_000_000_000_000 for u in outdeg}
    for _ in range(8):
        nxt: dict[int, int] = {}
        for u, v in und:
            nxt[v] = nxt.get(v, 0) + rank[u] // outdeg[u]
        nxt = {v: 150_000_000_000 + (85 * s) // 100
               for v, s in nxt.items()}
        if nxt == rank:
            break
        rank = nxt
    got = {r.node: r.pagerank_scaled
           for r in REGISTRY["graph_pagerank_fixpoint"]
           .spark(spark, crafted_graph_sf_dir).collect()}
    assert got == rank
