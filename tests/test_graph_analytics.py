"""Oracle gates for the pytest-gated graph analytics (driver registry is
capped at 50 entries).

triangle_count: the Spark plan uses DEGREE-ordered edge orientation (the
scalable form); the DuckDB oracle uses ID-ordered orientation.  Triangle
/ wedge counts are orientation-invariant, so value equality both checks
the numbers and pins that the degree-ordered rewrite is lossless.

pagerank_customers: float fixpoint — not hash-comparable under the
driver contract — so the oracle is a pure-Python power iteration over
the collected edge list, compared per-vertex at 1e-9 relative tolerance
(Spark's float-sum order differs from Python's; damping < 1 keeps the
divergence contracting instead of compounding).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from oracle_util import canon_rows

from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
    PYTEST_ORACLES,
    PYTEST_QUERIES,
    pagerank_customers,
    pagerank_reference,
    triangle_count,
)
from distributed_graph_coloring_with_pyspark_spark.operators.graph_bridge import (
    customer_graph_edges,
)

SF = "/root/testdata/sf0.01"


def _oracle_con():
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(PYTEST_ORACLES))
def test_graph_analytics_matches_oracle(spark, name):
    sdf = PYTEST_QUERIES[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    con = _oracle_con()
    ddf = con.sql(PYTEST_ORACLES[name])
    dcols, drows = ddf.columns, ddf.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols), name
    assert len(srows) == len(drows), name
    assert srows, name
    assert canon_rows(sdf.columns, srows) == canon_rows(dcols, drows), name


def test_triangle_count_nonzero(spark):
    # the fixture graph must actually exercise the operator
    row = triangle_count(spark, SF).collect()[0]
    assert row.n_triangles > 0 and row.n_wedges >= 3 * row.n_triangles


def test_graph_components_shape(spark):
    rows = PYTEST_QUERIES["graph_components"](spark, SF).collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for cid, members in by_comp.items():
        assert len(members) == members[0].component_size
        assert cid == min(m.id for m in members)  # label = min id
    # isolated customers appear as singletons: every customer has a row
    assert len(rows) == len({r.id for r in rows})


def test_pagerank_matches_power_iteration(spark):
    edges = [(r.src, r.dst) for r in customer_graph_edges(spark, SF).collect()]
    got = {r.id: r.pagerank for r in pagerank_customers(spark, SF).collect()}
    want = pagerank_reference(edges, sorted(got))
    assert set(got) == set(want)
    for v, r in want.items():
        assert math.isclose(got[v], r, rel_tol=1e-9, abs_tol=1e-12), v
    # probability mass is conserved by the dangling-node formulation
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)
    # connected vertices must outrank the isolated floor (1-d)/N + d*D/N
    deg_pos = {s for s, _ in edges}
    isolated = [v for v in got if v not in deg_pos]
    if isolated and deg_pos:
        floor = got[isolated[0]]
        assert max(got[v] for v in deg_pos) > floor


def test_pagerank_uniform_on_edgeless_graph(spark):
    """All-dangling corner: with no edges every vertex keeps exactly
    1/N — the dangling-mass redistribution is a fixpoint (and exact in
    floats: (1-d)/n + d*(n*(1/n)/n) = 1/n termwise)."""
    ids = list(range(7))
    want = pagerank_reference([], ids)
    assert all(math.isclose(w, 1.0 / 7, rel_tol=1e-12) for w in want.values())


def _peel_core_numbers(edges):
    """Sequential peeling reference: repeatedly remove the minimum-degree
    vertex; its core number is the running maximum of those minimums."""
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict = {}
    k = 0
    while deg:
        v = min(deg, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        for u in adj[v]:
            if u in deg and u != v:
                deg[u] -= 1
        del deg[v]
    return core


def test_kcore_matches_python_peeling(spark):
    edges = [(r.src, r.dst) for r in customer_graph_edges(spark, SF).collect()]
    got = {r.id: r.core for r in PYTEST_QUERIES["graph_kcore"](spark, SF).collect()}
    want = _peel_core_numbers(edges)
    for v, c in want.items():
        assert got[v] == c, f"vertex {v}: H-index fixpoint {got[v]} != peeling {c}"
    # customers outside the edge set are core 0 singletons
    assert all(c == 0 for v, c in got.items() if v not in want)
    assert max(got.values()) >= 2, "fixture graph should have a non-trivial core"


def test_sssp_matches_python_dijkstra(spark):
    import heapq

    edges = [(r.src, r.dst) for r in customer_graph_edges(spark, SF).collect()]
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append((d, (s + d) % 7 + 1))
    src = min(r.id for r in PYTEST_QUERIES["graph_bfs_distances"](spark, SF).collect())
    # reference Dijkstra from the same min-id source
    want = {src: 0}
    pq = [(0, src)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > want.get(v, float("inf")):
            continue
        for u, w in adj.get(v, []):
            nd = d + w
            if nd < want.get(u, float("inf")):
                want[u] = nd
                heapq.heappush(pq, (nd, u))
    got = {
        r.id: r.dist
        for r in PYTEST_QUERIES["graph_sssp_weighted"](spark, SF).collect()
    }
    assert got == want
    # weighted cost must dominate hop count (weights >= 1)
    bfs = {r.id: r.dist for r in PYTEST_QUERIES["graph_bfs_distances"](spark, SF).collect()}
    assert all(got[v] >= bfs[v] for v in got)


def test_iterative_loops_one_action_per_round(spark, monkeypatch):
    """Extend the coloring core's one-action-per-round pin
    (tests/test_coloring.py) to every other iterative engine in this
    module: each loop round must issue exactly ONE driver action —
    BFS its frontier count, the label/relax loops their sum collect —
    and nothing else (a stray count()/collect() per round is the
    classic iterative-Spark perf regression)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
        bfs_distances,
        kcore_numbers,
        min_label_components,
        sssp_distances,
    )

    # symmetric path 0-1-2-3 plus isolated-ish triangle 4-5-6
    und = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    wedges = edges.selectExpr("src", "dst", "(src + dst) % 7 + 1 as weight")
    src = spark.createDataFrame([(0,)], "id long")
    DF = type(edges)

    calls = {"collect": 0, "count": 0}
    orig_collect, orig_count = DF.collect, DF.count
    monkeypatch.setattr(
        DF,
        "collect",
        lambda self: (calls.__setitem__("collect", calls["collect"] + 1), orig_collect(self))[1],
    )
    monkeypatch.setattr(
        DF,
        "count",
        lambda self: (calls.__setitem__("count", calls["count"] + 1), orig_count(self))[1],
    )

    # BFS from 0 on the path: frontiers at depth 1,2,3 then empty → 4
    # counts exactly, zero collects
    calls.update(collect=0, count=0)
    got = {(r.id, r.dist) for r in orig_collect(bfs_distances(edges, src))}
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3)}
    assert calls["count"] == 4 and calls["collect"] == 0, calls

    # label propagation: one sum collect per round (+ init), no counts
    calls.update(collect=0, count=0)
    labels = {(r.id, r.label) for r in orig_collect(min_label_components(edges))}
    assert labels == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 4), (5, 4), (6, 4)}
    assert calls["count"] == 0 and 2 <= calls["collect"] <= 6, calls

    # k-core: same discipline
    calls.update(collect=0, count=0)
    cores = {(r.id, r.core) for r in orig_collect(kcore_numbers(edges))}
    assert cores == {(0, 1), (1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2)}
    assert calls["count"] == 0 and 2 <= calls["collect"] <= 6, calls

    # weighted SSSP: sum collect per round only
    calls.update(collect=0, count=0)
    dist = {(r.id, r.dist) for r in orig_collect(sssp_distances(wedges, src))}
    assert dist == {(0, 0), (1, 2), (2, 6), (3, 12)}
    assert calls["count"] == 0 and 2 <= calls["collect"] <= 7, calls

    # star contraction: one stats collect per round (+ init) and exactly
    # ONE count — the final cross-label edge validation
    from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
        star_contraction_components,
    )

    calls.update(collect=0, count=0)
    labels = {
        (r.id, r.label) for r in orig_collect(star_contraction_components(edges))
    }
    assert labels == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 4), (5, 4), (6, 4)}
    assert calls["count"] == 1 and 2 <= calls["collect"] <= 8, calls


def _cc_recursive_cte_oracle(und_edges):
    """Recursive-CTE closure over an explicit edge list — the same
    oracle family as _COMPONENTS_ORACLE, on arbitrary planted graphs."""
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany(
        "INSERT INTO e VALUES (?, ?)",
        list(und_edges) + [(b, a) for a, b in und_edges],
    )
    rows = con.sql(
        """
        WITH RECURSIVE reach(id, r) AS (
            SELECT src, src FROM e
            UNION
            SELECT reach.id, e.dst FROM reach JOIN e ON e.src = reach.r
        )
        SELECT id, min(r) FROM reach GROUP BY id ORDER BY id
        """
    ).fetchall()
    con.close()
    return set(rows)


def test_star_contraction_planted_graphs(spark):
    """Kiveris large-star/small-star engine vs the recursive-CTE oracle
    on planted shapes: a permuted high-diameter chain (the min-label
    killer), two components + a hub star, and a ring."""
    import random

    from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
        star_contraction_components,
    )

    rng = random.Random(7)
    ids = list(range(1000, 1080))
    rng.shuffle(ids)
    chain = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    hub = [(500, x) for x in (501, 502, 503)] + [(600, 601)]
    ring = [(i, 700 + ((i - 700 + 1) % 9)) for i in range(700, 709)]
    for und in (chain, hub, ring, chain + hub + ring):
        edges = spark.createDataFrame(
            und + [(b, a) for a, b in und], "src long, dst long"
        )
        got = {
            (r.id, r.label) for r in star_contraction_components(edges).collect()
        }
        assert got == _cc_recursive_cte_oracle(und), und[:3]


def test_min_label_escalates_to_star_on_exhaustion(spark):
    """A planted path of diameter 59 > max_rounds=50: min-label alone
    cannot converge, so the engine must hand off to star contraction
    and still return the exact component labels (VERDICT r4 #4) —
    and the opt-out still raises."""
    import pytest as _pytest

    from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
        min_label_components,
    )

    und = [(i, i + 1) for i in range(60 - 1)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {(r.id, r.label) for r in min_label_components(edges).collect()}
    assert got == {(i, 0) for i in range(60)}
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        min_label_components(edges, on_exhaustion="raise")


def test_bfs_max_depth_boundary(spark):
    """Eccentricity == max_depth is a COMPLETE traversal, not a failure
    (ADVICE r4): the post-loop probe must distinguish it from a truly
    truncated one."""
    from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
        bfs_distances,
    )

    und = [(0, 1), (1, 2)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    src = spark.createDataFrame([(0,)], "id long")
    got = {(r.id, r.dist) for r in bfs_distances(edges, src, max_depth=2).collect()}
    assert got == {(0, 0), (1, 1), (2, 2)}
    with pytest.raises(RuntimeError, match="frontier still live"):
        bfs_distances(edges, src, max_depth=1)


def test_ppr_matches_personalized_power_iteration(spark):
    """Personalized PageRank vs the driver-side power-iteration twin:
    same seeds, same rule — plus the PPR-specific invariants: mass
    conservation, zero rank for vertices unreachable from the seeds,
    and seeds outranking the global median (locality)."""
    from distributed_graph_coloring_with_pyspark_spark.operators.graph_analytics import (
        _PPR_SEED_CUT,
        ppr_customers,
        ppr_reference,
    )

    edges = [(r.src, r.dst) for r in customer_graph_edges(spark, SF).collect()]
    got = {r.id: r.ppr for r in ppr_customers(spark, SF).collect()}
    seeds = [v for v in got if v < _PPR_SEED_CUT]
    want = ppr_reference(edges, sorted(got), seeds)
    assert set(got) == set(want)
    for v, r in want.items():
        assert math.isclose(got[v], r, rel_tol=1e-9, abs_tol=1e-12), v
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)
    # unreachable-from-seeds vertices hold exactly 0 mass
    reach = set(seeds)
    frontier = set(seeds)
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    while frontier:
        nxt = {d for u in frontier for d in adj.get(u, [])} - reach
        reach |= nxt
        frontier = nxt
    for v, r in got.items():
        if v not in reach:
            assert r == 0.0, v
