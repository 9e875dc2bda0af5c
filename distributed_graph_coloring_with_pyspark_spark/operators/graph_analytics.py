"""Graph analytics over the customer fixture graph: triangle counting
and PageRank — the two classic "would your graph layer generalize?"
probes beyond coloring.  The reference repo's only graph algorithm is
coloring (reference coloring.py:73-132); these reuse its loop and edge
machinery to show the engine is a graph *platform*, not a single
algorithm.

Both run on the memoized ``customer_graph_edges`` fixture (symmetric,
distinct, skew-capped — graph_bridge.py), so the scan/shuffle work of
building the graph is shared with the four registered graph queries.

Scale design
------------
* **Triangles**: the naive symmetric-edge 3-way self-join counts every
  triangle 6× and, worse, generates wedges at hubs quadratically.  The
  standard scalable fix (degree-ordered orientation) is used here:
  orient each undirected edge from the (degree, id)-smaller endpoint to
  the larger.  Every vertex's *oriented* out-degree is O(sqrt(|E|)) for
  graphs with arboricity-bounded structure, wedges are generated only
  at the lowest-ranked corner, and each triangle appears exactly once
  as a path a→b→c closed by a→c.  Three equi-joins, no driver state —
  this is the plan you'd run at 100 TB.
* **PageRank**: same driver-loop discipline as the coloring core
  (operators/coloring.py:144-239): per-iteration state is truncated
  with a LAZY ``localCheckpoint`` (logical plan becomes a leaf
  immediately, RDD materializes on the terminal action), and the loop
  body issues ZERO actions — the dangling-node mass is folded in as a
  one-row aggregate cross-joined (broadcast) into the rank update
  instead of being collected to the driver.  Shuffle width is scoped to
  |V| via scoped_shuffle_partitions.  Fixed iteration count keeps the
  result deterministic and both-engine-reproducible (no float
  convergence test).

Correctness
-----------
* ``triangle_count`` is value-checked against a DuckDB oracle that uses
  the *id*-ordered orientation (src < dst) — a different orientation of
  the same edge set.  Triangle/wedge counts are orientation-invariant,
  so any disagreement is a real bug, and the agreement also pins that
  the degree-ordered rewrite lost nothing.
* ``pagerank_customers`` is iterative float fixpoint work — not
  SQL-expressible under the driver's hash contract — so it is gated by
  a pure-Python power-iteration oracle over the collected edge list
  (tests/test_graph_analytics.py) with 1e-9 relative tolerance (Spark's
  float-sum order differs from Python's; damping < 1 contracts the
  difference each round).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .coloring import degrees, scoped_shuffle_partitions
from .graph_bridge import EDGES_CTE, customer_graph_edges

def _materialize(df: DataFrame) -> DataFrame:
    """Force an action-free loop's lazily-checkpointed state INSIDE the
    current ``scoped_shuffle_partitions`` block (otherwise the rounds
    would execute at the caller's terminal action, after the scope
    restored the session shuffle width).  A noop-format write is the
    cheapest full-plan action and measurably beats
    ``localCheckpoint(eager=True)`` for the same effect — r6's
    isolation of the r5 graph-family creep put pagerank_customers at
    3.7 s (noop write) vs 4.4 s (eager) at sf0.1: the eager path pays
    an extra RDD materialization pass the write avoids, while the lazy
    checkpoint wrapping ``df`` still registers its blocks on this first
    compute for every downstream read."""
    df.write.format("noop").mode("overwrite").save()
    return df


PAGERANK_ITERATIONS = 10
PAGERANK_DAMPING = 0.85


def min_label_components(
    edges: DataFrame, max_rounds: int = 50, on_exhaustion: str = "star"
) -> DataFrame:
    """Connected components of a symmetric ``edges(src, dst)`` frame by
    iterative min-label propagation → (id, label) for every vertex that
    touches an edge, label = min vertex id in its component.

    THE shared component engine: ``graph_components`` below and
    ``text_dedup.dedup_components`` (near-dup clustering) both call it,
    each gated by its own recursive-CTE DuckDB oracle.  Loop discipline
    is the coloring core's (operators/coloring.py:153-238): ONE action
    per round — the label SUM, which strictly decreases until fixpoint
    because labels are monotone non-increasing, so no changed-row
    self-join is needed — and a lazy ``localCheckpoint`` per round to
    stop lineage growth.

    100 TB: rounds = component diameter (dedup graphs: small dense
    clusters, 2 rounds measured; social-ish graphs: low tens).  For
    adversarially chain-shaped graphs min-label needs diameter rounds;
    on round exhaustion this now ESCALATES to large-star/small-star
    contraction (``star_contraction_components``, Kiveris et al. 2014,
    O(log² n) rounds) instead of raising — pass
    ``on_exhaustion="raise"`` to restore the hard stop, or call the
    star engine directly when the graph is known to be chain-shaped.
    """
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_rounds):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]  # the ONE action
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        if on_exhaustion == "star":
            return star_contraction_components(edges)
        raise RuntimeError(
            f"min_label_components: no fixpoint within {max_rounds} rounds —"
            " component diameter exceeds the bound; raise max_rounds or use"
            " star_contraction_components (Kiveris et al. 2014)"
        )
    return labels


def star_contraction_components(
    edges: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """Connected components of a symmetric ``edges(src, dst)`` frame by
    alternating LARGE-STAR / SMALL-STAR contraction (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond", Algorithm 3)
    → (id, label) for every vertex that touches an edge, label = min
    vertex id in its component — the same output contract as
    ``min_label_components``, which escalates here on round exhaustion.

    Per round, over the canonical undirected edge set (hi > lo):

    - large-star: each vertex u links every STRICTLY LARGER neighbor v
      to m = min(Γ(u) ∪ {u}) — hubs collapse toward their minimum.
    - small-star: each vertex u links its smaller neighbors (and
      itself) to its minimum smaller neighbor.

    Both steps preserve connectivity and monotonically pull edges
    toward component minima; the paper proves O(log² n) rounds to the
    star-forest fixpoint, vs. O(diameter) for label propagation — this
    is the engine for chain-shaped / high-diameter graphs.

    Loop discipline matches the coloring core: ONE driver action per
    round (a single count+edge-sum aggregate; every emitted edge's
    partner only ever decreases and dedup only removes rows, so the
    (count, sum) pair is stationary iff the edge set is), and a lazy
    ``localCheckpoint`` per round to stop lineage growth.  A final
    one-join validation asserts every ORIGINAL edge has both endpoints
    under one label — the cheap hard-correctness backstop for the
    statistical fixpoint test.  ``max_rounds`` defaults to the PROVEN
    ⌈log₂ n⌉² bound (+slack), self-scaled from the initial edge count
    the first stats action already paid for — observed behavior is
    ≈ log₂ n (19 rounds on a 200 000-vertex path, SCALE.md), so
    exhaustion can only mean a round-update bug, and the error says so.
    100 TB: each step is one groupBy-min + one equi-join on vertex id,
    no driver state beyond the 2-scalar round stats."""
    canon = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    stats = canon.agg(
        F.count("*").alias("c"), F.sum(F.col("hi") + F.col("lo")).alias("s")
    ).collect()[0]
    prev = (stats.c, stats.s)
    if max_rounds is None:
        # Kiveris worst case is O(log² n) rounds; n ≤ 2·|canon edges|,
        # known from the init stats at no extra action.
        n_upper = max(2, 2 * (stats.c or 0))
        max_rounds = math.ceil(math.log2(n_upper)) ** 2 + 8
    for _ in range(max_rounds):
        # large-star over the symmetric view: m = min(Γ(u) ∪ {u});
        # emit (v, m) for v ∈ Γ(u), v > u.  v > u ≥ m ⇒ already (hi, lo).
        sym = canon.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionAll(
            canon.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        lmin = sym.groupBy("u").agg(F.min(F.least("v", F.col("u"))).alias("m"))
        after_large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star over the (hi, lo) orientation: m = min smaller
        # neighbor of u; emit (v, m) for the other smaller neighbors v
        # and (u, m).  m ≤ v < u keeps the canonical orientation.
        smin = after_large.groupBy("hi").agg(F.min("lo").alias("m"))
        canon = (
            after_large.join(smin, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionAll(smin.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        stats = canon.agg(
            F.count("*").alias("c"), F.sum(F.col("hi") + F.col("lo")).alias("s")
        ).collect()[0]  # the ONE action per round
        cur = (stats.c, stats.s)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"star_contraction_components: no fixpoint within {max_rounds}"
            " rounds — the proven O(log² n) worst case is exceeded, which"
            " indicates a bug in the round update (input shape cannot cause"
            " this: canonicalization symmetrizes any edge frame)"
        )
    # star forest → labels: leaves take their (unique) center, centers
    # take themselves; groupBy-min instead of a bare rename so a
    # not-quite-star state can't silently drop rows.
    labels = (
        canon.groupBy(F.col("hi").alias("id")).agg(F.min("lo").alias("label"))
        .unionAll(
            canon.select(F.col("lo").alias("id"), F.col("lo").alias("label")).distinct()
        )
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    verts = edges.select(F.col("src").alias("id")).distinct()
    labels = (
        verts.join(labels, "id", "left")
        .select("id", F.coalesce("label", F.col("id")).alias("label"))
        .localCheckpoint(eager=False)
    )
    bad = (
        edges.join(labels.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("label", "src_label")
        .join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("dst_label")),
            "dst",
        )
        .filter(F.col("src_label") != F.col("dst_label"))
        .count()
    )
    if bad:
        raise RuntimeError(
            f"star_contraction_components: {bad} edges cross labels — fixpoint"
            " detector accepted a non-star state (bug)"
        )
    return labels


def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the customer fixture graph, isolated
    customers included as singletons → (id, component_id,
    component_size) for EVERY customer, component_id = min customer id
    in the component."""
    edges = customer_graph_edges(spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    n = cu.count()
    with scoped_shuffle_partitions(spark, n):
        labels = min_label_components(edges)
        full = cu.join(labels, "id", "left").select(
            "id", F.coalesce("label", F.col("id")).alias("component_id")
        )
        sizes = full.groupBy("component_id").agg(
            F.count("*").cast("long").alias("component_size")
        )
        return full.join(sizes, "component_id").select(
            "id", "component_id", "component_size"
        ).orderBy("id")


_COMPONENTS_ORACLE = f"""
    WITH RECURSIVE {EDGES_CTE},
    reach(id, r) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION
        SELECT reach.id, e.dst FROM reach JOIN e ON e.src = reach.r
    ),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
    sizes AS (
        SELECT component_id, count(*)::BIGINT AS component_size
        FROM comp GROUP BY 1
    )
    SELECT id, component_id, component_size
    FROM comp JOIN sizes USING (component_id)
    ORDER BY id
"""


LPA_ROUNDS = 4


def lpa_labels(edges: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) made fully
    DETERMINISTIC: labels start as vertex ids; each round EVERY vertex
    simultaneously adopts its neighbors' most frequent label, ties
    broken by the smallest label.  A FIXED round count (no convergence
    probe — synchronous LPA can 2-cycle on bipartite-ish structure, so
    a fixpoint test may never fire) keeps the result a pure function of
    the edge set, which is what lets the DuckDB oracle replay the exact
    rounds and VALUE-check an algorithm that is normally only
    modularity-gated.

    Precondition: ``edges`` must be SYMMETRIC (both (a,b) and (b,a)
    present), same as min_label_components — seeds and propagation run
    over src-side vertices only, so a dst-only vertex of an asymmetric
    frame would silently drop out of the result.

    Loop discipline is the house pattern (coloring.py:144-239): the
    body is action-free — per-round cost is one (src, label) equi-join
    + one (id, label) count agg + one top-1 window per vertex, lineage
    truncated by a lazy localCheckpoint.  At 100 TB each round is a
    degree-sum-sized shuffle keyed on vertex id; rounds are O(1) by
    construction."""
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("id").orderBy(F.desc("cnt"), "nbr_label")
    for _ in range(rounds):
        labels = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"), F.col("label").alias("nbr_label"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("id", F.col("nbr_label").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels


def graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community assignment of the customer fixture graph after
    ``LPA_ROUNDS`` synchronous label-propagation rounds — singleton
    customers included as their own community → (id, community_id,
    community_size) for every customer."""
    edges = customer_graph_edges(spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    n = cu.count()
    with scoped_shuffle_partitions(spark, n):
        # Materialize INSIDE the scope (review r5, same as
        # pagerank_customers): lpa_labels' body is action-free, so
        # without an action here all LPA rounds would execute at the
        # caller's terminal action — after the with-block restored the
        # session shuffle width, undoing the |V|-scoped clamp.
        labels = _materialize(lpa_labels(edges))
        full = cu.join(labels, "id", "left").select(
            "id", F.coalesce("label", F.col("id")).alias("community_id")
        )
        sizes = full.groupBy("community_id").agg(
            F.count("*").cast("long").alias("community_size")
        )
        return (
            full.join(sizes, "community_id")
            .select("id", "community_id", "community_size")
            .orderBy("id")
        )


def _lpa_label_ctes(rounds: int = LPA_ROUNDS) -> list[str]:
    # the fixed round count is what makes these oracles possible:
    # unroll each synchronous round as its own CTE (recursive CTEs
    # cannot aggregate over the working table); shared by the
    # communities and modularity oracles so both replay THE SAME rounds
    ctes = ["lab0 AS (SELECT DISTINCT src AS id, src AS label FROM e)"]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""lab{r} AS (
        SELECT id, nbr_label AS label FROM (
            SELECT e.src AS id, l.label AS nbr_label,
                   row_number() OVER (
                       PARTITION BY e.src
                       ORDER BY count(*) DESC, l.label) AS rk
            FROM e JOIN lab{r - 1} l ON e.dst = l.id
            GROUP BY e.src, l.label)
        WHERE rk = 1
    )"""
        )
    return ctes


def _lpa_oracle(rounds: int = LPA_ROUNDS) -> str:
    return f"""
    WITH {EDGES_CTE},
    {', '.join(_lpa_label_ctes(rounds))},
    full_lab AS (
        SELECT c.c_custkey AS id,
               coalesce(l.label, c.c_custkey) AS community_id
        FROM customer c LEFT JOIN lab{rounds} l ON l.id = c.c_custkey
    ),
    sizes AS (
        SELECT community_id, count(*)::BIGINT AS community_size
        FROM full_lab GROUP BY 1
    )
    SELECT id, community_id, community_size
    FROM full_lab JOIN sizes USING (community_id)
    ORDER BY id
"""


_LPA_ORACLE = _lpa_oracle()


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA community assignment — the quality
    scalar that turns ``graph_communities`` from "labels converged"
    into "the partition is measurably better than random" →
    one row (n_communities, n_intra_edges, modularity).

    Q = Σ_c [ E_c/2m − (deg_c/2m)² ] over the SYMMETRIC edge list
    (2m = directed edge count, E_c = directed intra-community edges,
    deg_c = degree mass of c) — Newman & Girvan 2004, eq. 5.  Zero-
    degree singleton communities contribute exactly 0, so they are
    counted in n_communities but need no term.

    Scale shape: two id-keyed joins of the |V|-row label frame onto the
    edges (NO broadcast hint — labels scale with the graph, AQE decides,
    same rationale as graph_assortativity), two map-side-combinable
    label aggs, and a broadcast one-row 2m aggregate; the final Q is a
    sum over the bounded community table.  LPA rounds themselves are
    the shared ``lpa_labels`` loop (one shuffle per round)."""
    edges = customer_graph_edges(spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    n = cu.count()
    with scoped_shuffle_partitions(spark, n):
        labels = _materialize(lpa_labels(edges))
        full = cu.join(labels, "id", "left").select(
            "id", F.coalesce("label", F.col("id")).alias("community_id")
        )
        m2 = edges.agg(F.count("*").cast("double").alias("m2"))
        lab_src = full.select(F.col("id").alias("src"), F.col("community_id").alias("c_src"))
        lab_dst = full.select(F.col("id").alias("dst"), F.col("community_id").alias("c_dst"))
        intra = (
            edges.join(lab_src, "src")
            .join(lab_dst, "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .groupBy(F.col("c_src").alias("community_id"))
            .agg(F.count("*").cast("long").alias("e_c"))
        )
        deg_c = (
            degrees(edges)
            .join(full, "id")
            .groupBy("community_id")
            .agg(F.sum("degree").cast("double").alias("deg_c"))
        )
        contrib = (
            deg_c.join(intra, "community_id", "left")
            .select(
                F.coalesce(F.col("e_c"), F.lit(0)).alias("e_c"),
                "deg_c",
            )
            .crossJoin(F.broadcast(m2))
            .select(
                "e_c",
                (F.col("e_c") / F.col("m2") - (F.col("deg_c") / F.col("m2")) ** 2).alias("q"),
            )
        )
        n_comm = full.agg(
            F.countDistinct("community_id").cast("long").alias("n_communities")
        )
        return contrib.agg(
            F.sum("e_c").cast("long").alias("n_intra_edges"),
            F.round(F.sum("q"), 6).alias("modularity"),
        ).crossJoin(F.broadcast(n_comm)).select(
            "n_communities", "n_intra_edges", "modularity"
        )


def _modularity_oracle(rounds: int = LPA_ROUNDS) -> str:
    return f"""
    WITH {EDGES_CTE},
    {', '.join(_lpa_label_ctes(rounds))},
    full_lab AS (
        SELECT c.c_custkey AS id,
               coalesce(l.label, c.c_custkey) AS community_id
        FROM customer c LEFT JOIN lab{rounds} l ON l.id = c.c_custkey
    ),
    m2 AS (SELECT count(*)::DOUBLE AS m2 FROM e),
    intra AS (
        SELECT ls.community_id, count(*)::BIGINT AS e_c
        FROM e
        JOIN full_lab ls ON e.src = ls.id
        JOIN full_lab ld ON e.dst = ld.id
        WHERE ls.community_id = ld.community_id
        GROUP BY 1
    ),
    deg AS (SELECT src AS id, count(*) AS degree FROM e GROUP BY src),
    deg_c AS (
        SELECT f.community_id, sum(deg.degree)::DOUBLE AS deg_c
        FROM deg JOIN full_lab f USING (id) GROUP BY 1
    ),
    contrib AS (
        SELECT coalesce(i.e_c, 0) AS e_c,
               coalesce(i.e_c, 0) / m2.m2 - (d.deg_c / m2.m2) ^ 2 AS q
        FROM deg_c d LEFT JOIN intra i USING (community_id) CROSS JOIN m2
    )
    SELECT (SELECT count(DISTINCT community_id) FROM full_lab)::BIGINT
               AS n_communities,
           sum(e_c)::BIGINT AS n_intra_edges,
           round(sum(q), 6) AS modularity
    FROM contrib
"""


_MODULARITY_ORACLE = _modularity_oracle()


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the fixture graph — Pearson correlation
    of (degree(src), degree(dst)) over the symmetric edge list (Newman
    2002), the one-scalar answer to "do hubs attach to hubs?".  Two
    id-keyed joins of the |V|-row degree table onto the edges (NO
    broadcast hint — the degree table scales with the graph, so the
    planner must stay free to pick shuffle-hash/sort-merge; AQE still
    broadcasts when the measured size permits) and one corr aggregate,
    a streaming moment computation with no sort.  Value-checked
    against DuckDB's corr over the identical edge CTE."""
    edges = customer_graph_edges(spark, sf_dir)
    deg = degrees(edges)
    ds = deg.select(F.col("id").alias("src"), F.col("degree").alias("d_src"))
    dd = deg.select(F.col("id").alias("dst"), F.col("degree").alias("d_dst"))
    return (
        edges.join(ds, "src")
        .join(dd, "dst")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.round(F.corr("d_src", "d_dst"), 6).alias("assortativity"),
        )
    )


_ASSORTATIVITY_ORACLE = f"""
    WITH {EDGES_CTE},
    deg AS (SELECT src AS id, count(*) AS degree FROM e GROUP BY src)
    SELECT count(*)::BIGINT AS n_edges,
           round(corr(a.degree, b.degree), 6) AS assortativity
    FROM e
    JOIN deg a ON e.src = a.id
    JOIN deg b ON e.dst = b.id
"""


KCORE_MAX_ROUNDS = 100


def kcore_numbers(edges: DataFrame, max_rounds: int = KCORE_MAX_ROUNDS) -> DataFrame:
    """Core number (max k such that the vertex survives k-core peeling)
    for every vertex of a symmetric ``edges(src, dst)`` frame, by the
    distributed H-index fixpoint (Lü et al. 2016, "Vital nodes
    identification in complex networks"; also Montresor et al. 2013):

        c_0(v)   = degree(v)
        c_t+1(v) = H({c_t(u) : u ~ v})   (H = h-index of the multiset)

    c_t is monotone non-increasing and converges to the exact coreness
    — no sequential peeling order needed, which is what makes k-core
    distributable.  Each round is one edges⋈labels shuffle plus a
    per-src window (sort neighbors' values desc, h = max(min(value,
    rank))) — state per task is one vertex's neighbor list, the same
    bound every other per-key window in this repo carries.  Convergence
    test reuses the coloring-loop discipline: the label sum strictly
    decreases until fixpoint, so ONE action per round and a lazy
    ``localCheckpoint`` to keep lineage flat.

    100 TB: rounds observed/published are small (≈ O(log n) in
    practice); per-round cost equals one degree computation.  Skewed
    hubs concentrate their neighbor list on one task — the mitigation
    is the same _CELL_CAP-style degree cap the fixture graph already
    applies at build time."""
    c = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("int").alias("c"))
        .localCheckpoint(eager=False)
    )
    prev_sum = c.agg(F.sum("c")).collect()[0][0]
    for _ in range(max_rounds):
        w = Window.partitionBy("src").orderBy(F.desc("nc"), "dst")
        h = (
            edges.join(c, edges.dst == c.id)
            .select("src", "dst", F.col("c").alias("nc"))
            .withColumn("rn", F.row_number().over(w))
            .groupBy("src")
            .agg(F.max(F.least(F.col("nc"), F.col("rn"))).alias("h"))
        )
        c = (
            c.join(h, c.id == h.src)
            .select(F.col("id"), F.least(F.col("c"), F.col("h")).alias("c"))
            .localCheckpoint(eager=False)
        )
        cur_sum = c.agg(F.sum("c")).collect()[0][0]  # the ONE action
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"kcore_numbers: H-index fixpoint not reached within {max_rounds}"
            " rounds — raise max_rounds (published convergence is far below"
            " |V| in practice, so this signals a pathological input)"
        )
    return c.select("id", F.col("c").alias("core"))


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core number for every customer in the fixture graph (isolated
    customers = core 0) → (id, core), ordered by id.  Gated by a
    pure-Python peeling oracle (tests/test_graph_analytics.py) — the
    H-index fixpoint and sequential peeling must agree exactly."""
    edges = customer_graph_edges(spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    n = cu.count()
    with scoped_shuffle_partitions(spark, n):
        cores = kcore_numbers(edges)
        return (
            cu.join(cores, "id", "left")
            .select("id", F.coalesce("core", F.lit(0)).alias("core"))
            .orderBy("id")
        )


BFS_MAX_DEPTH = 40


def bfs_distances(edges: DataFrame, sources: DataFrame, max_depth: int = BFS_MAX_DEPTH) -> DataFrame:
    """Unweighted single/multi-source BFS over a symmetric
    ``edges(src, dst)`` frame → (id, dist) for every reachable vertex.

    Frontier-expansion form: each round joins the previous frontier to
    the edge list, anti-joins already-settled vertices, and settles the
    rest at dist = round.  Loop discipline is the coloring core's
    (operators/coloring.py:153-238): ONE action per round (the frontier
    count, which doubles as the termination test) and a lazy
    ``localCheckpoint`` per round so lineage stays flat.

    100 TB: per-round work is |frontier ⋈ edges| — the same shuffle a
    Pregel superstep does; rounds = source eccentricity.  The settled
    set only grows, and the anti-join keys on it, so the natural next
    step at extreme scale is bucketing both sides on id.  Weighted
    graphs escalate to iterated min-dist relaxation (same loop, min
    aggregate instead of anti-join)."""
    dist = sources.select(F.col("id"), F.lit(0).alias("dist")).localCheckpoint(
        eager=False
    )
    frontier = dist.select("id")
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:  # the ONE action per round
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("id")
    else:
        # Vertices settled at exactly max_depth are fine IF nothing lies
        # deeper (eccentricity == max_depth): probe one extra expansion
        # and raise only when it finds unreached vertices — raising on a
        # completed traversal was a spurious failure (ADVICE r4).
        probe = (
            edges.join(frontier, edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
        )
        if probe.count() > 0:
            raise RuntimeError(
                f"bfs_distances: frontier still live after {max_depth} rounds —"
                " source eccentricity exceeds the bound; raise max_depth"
                " (silently truncating would drop every deeper vertex)"
            )
    return dist


SSSP_MAX_ROUNDS = 200  # Bellman-Ford worst case is |V|-1 relaxation rounds


def sssp_distances(
    edges: DataFrame, sources: DataFrame, max_rounds: int = SSSP_MAX_ROUNDS
) -> DataFrame:
    """WEIGHTED single-source shortest paths over ``edges(src, dst,
    weight)`` — the escalation ``bfs_distances`` names: distributed
    Bellman-Ford by iterated relaxation.  Each round joins the current
    tentative distances to the edge list, takes the per-vertex min of
    (old, via-neighbor) — and, unlike BFS, may REVISIT a settled vertex
    with a cheaper path, which is exactly what makes it correct on
    weighted graphs.  Convergence: the distance sum is monotone
    non-increasing and strictly decreases until fixpoint, so the loop
    keeps the house discipline — ONE action per round, lazy
    ``localCheckpoint``.  Rounds ≤ longest shortest path in hops
    (classic Bellman-Ford bound ≤ |V|−1; small-world graphs converge in
    tens).  Integer weights keep the fixpoint float-free, so the sum
    test is exact."""
    dist = sources.select(F.col("id"), F.lit(0).cast("long").alias("dist"))
    dist = dist.localCheckpoint(eager=False)
    prev_sum = None
    for _ in range(max_rounds):
        relaxed = (
            edges.join(dist, edges.src == dist.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("weight")).alias("cand"),
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        dist = (
            dist.join(relaxed, "id", "full_outer")
            .select(
                # least() skips NULLs: a newly-reached vertex takes cand,
                # an un-relaxed vertex keeps dist
                "id",
                F.least("dist", "cand").alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
        cur = dist.agg(
            F.sum("dist").alias("s"), F.count("*").alias("n")
        ).collect()[0]  # the ONE action per round
        key = (cur.s, cur.n)
        if key == prev_sum:
            break
        prev_sum = key
    else:
        raise RuntimeError(
            f"sssp_distances: no fixpoint within {max_rounds} relaxation"
            " rounds — the minimum-weight path depth exceeds the bound;"
            " raise max_rounds (Bellman-Ford worst case is |V|-1)"
        )
    return dist


def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest-path cost from the minimum customer id over
    the fixture graph, with a deterministic synthetic weight per edge
    (1 + (src+dst) mod 7 — both engines/oracles can derive it) →
    (id, dist) for every reachable vertex.  Gated by a pure-Python
    Dijkstra oracle (tests/test_graph_analytics.py); integer-exact."""
    edges = customer_graph_edges(spark, sf_dir).select(
        "src", "dst", ((F.col("src") + F.col("dst")) % 7 + 1).alias("weight")
    )
    cu = load_table(spark, sf_dir, "customer")
    source = cu.agg(F.min("c_custkey").alias("id")).select("id")
    n = cu.count()
    with scoped_shuffle_partitions(spark, n):
        return sssp_distances(edges, source).orderBy("id")


def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance from the minimum customer id to every customer
    it can reach in the fixture graph → (id, dist), deterministic and
    integer-exact (hash-comparable to the recursive-CTE oracle, rare
    for an iterative graph op)."""
    edges = customer_graph_edges(spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer")
    source = cu.agg(F.min("c_custkey").alias("id")).select("id")
    n = cu.count()
    with scoped_shuffle_partitions(spark, n):
        return bfs_distances(edges, source).orderBy("id")


_BFS_ORACLE = f"""
    WITH RECURSIVE {EDGES_CTE},
    walk(id, d) AS (
        SELECT min(c_custkey), 0 FROM customer
        UNION
        SELECT e.dst, walk.d + 1
        FROM walk JOIN e ON e.src = walk.id
        WHERE walk.d < {BFS_MAX_DEPTH}
    )
    SELECT id, min(d)::INT AS dist
    FROM walk
    GROUP BY id
    ORDER BY id
"""


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_triangles, n_wedges, n_edges, global_clustering).

    n_edges counts undirected edges (= oriented edges); n_wedges is
    Σ_v C(deg(v), 2) (unordered 2-paths); global clustering coefficient
    is the usual 3·triangles / wedges (0.0 when the graph has no wedge).
    """
    return triangle_stats(customer_graph_edges(spark, sf_dir))


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Degree-ordered oriented triangle/wedge stats over ANY symmetric
    edges(src, dst) frame — the reusable core of ``triangle_count``
    (also driven at 10× graph sizes by tools/scale_probe_graph.py)."""
    deg = degrees(edges)
    du = deg.select(F.col("id").alias("src"), F.col("degree").alias("d_src"))
    dv = deg.select(F.col("id").alias("dst"), F.col("degree").alias("d_dst"))
    # degree-ordered orientation: (degree, id)-smaller endpoint → larger;
    # a strict total order, so each undirected edge survives exactly once
    oriented = (
        edges.join(du, "src")
        .join(dv, "dst")
        .filter(
            (F.col("d_src") < F.col("d_dst"))
            | ((F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    # triangles = oriented path a→b→c closed by oriented edge a→c; the
    # orientation is a total order so each triangle matches exactly once
    ab = oriented
    bc = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = oriented.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"]).agg(
        F.count("*").cast("long").alias("n_triangles")
    )
    wedges_edges = deg.agg(
        (F.sum(F.col("degree") * (F.col("degree") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
    )
    return (
        tri.crossJoin(wedges_edges)  # two 1-row frames
        .select(
            "n_triangles",
            "n_wedges",
            "n_edges",
            F.when(F.col("n_wedges") > 0, F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
            .otherwise(F.lit(0.0))
            .alias("global_clustering"),
        )
    )


def graph_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average LOCAL clustering coefficient (Watts-Strogatz) of the
    fixture graph — the per-vertex companion of ``triangle_stats``'
    global transitivity ratio (the two famously disagree on skewed
    graphs, which is why both are standard) → one row:
    (n_vertices, n_eligible, avg_local_clustering, n_closed_vertices).

    local_cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) over vertices with
    degree ≥ 2 (the eligible set; the average is over eligible vertices
    only, the networkx/Watts-Strogatz convention).  Per-vertex triangle
    counts reuse the degree-ordered oriented join — each triangle row
    (a,b,c) is exploded to its three corners and hash-aggregated, so
    the plan adds ONE explode + agg to the already-scale-safe triangle
    plan (wedges stay closed-form from degrees)."""
    edges = customer_graph_edges(spark, sf_dir)
    deg = degrees(edges)
    du = deg.select(F.col("id").alias("src"), F.col("degree").alias("d_src"))
    dv = deg.select(F.col("id").alias("dst"), F.col("degree").alias("d_dst"))
    oriented = (
        edges.join(du, "src")
        .join(dv, "dst")
        .filter(
            (F.col("d_src") < F.col("d_dst"))
            | ((F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    ab = oriented
    bc = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = oriented.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri_corners = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("tri"))
    )
    per_vertex = (
        deg.filter(F.col("degree") >= 2)
        .join(tri_corners, "id", "left")
        .select(
            "id",
            (
                2.0
                * F.coalesce(F.col("tri"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1))
            ).alias("cc"),
        )
    )
    n_total = deg.agg(F.count("*").cast("long").alias("n_vertices"))
    return (
        per_vertex.agg(
            F.count("*").cast("long").alias("n_eligible"),
            F.round(F.avg("cc"), 6).alias("avg_local_clustering"),
            F.sum((F.col("cc") > 0).cast("long")).cast("long").alias(
                "n_closed_vertices"
            ),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "n_vertices", "n_eligible", "avg_local_clustering", "n_closed_vertices"
        )
    )


_LOCAL_CLUSTERING_ORACLE = f"""
    WITH {EDGES_CTE},
    o AS (SELECT src, dst FROM e WHERE src < dst),
    deg AS (SELECT src AS id, count(*) AS degree FROM e GROUP BY src),
    tri AS (
        SELECT a.src AS a, a.dst AS b, b.dst AS c
        FROM o a JOIN o b ON a.dst = b.src JOIN o cc ON cc.src = a.src AND cc.dst = b.dst
    ),
    corners AS (
        SELECT id, count(*)::BIGINT AS tri FROM (
            SELECT a AS id FROM tri UNION ALL
            SELECT b FROM tri UNION ALL
            SELECT c FROM tri
        ) GROUP BY id
    ),
    per_vertex AS (
        SELECT d.id,
               2.0 * coalesce(corners.tri, 0) / (d.degree * (d.degree - 1)) AS cc
        FROM deg d LEFT JOIN corners USING (id)
        WHERE d.degree >= 2
    )
    SELECT (SELECT count(*) FROM deg)::BIGINT AS n_vertices,
           count(*)::BIGINT AS n_eligible,
           round(avg(cc), 6) AS avg_local_clustering,
           sum((cc > 0)::BIGINT)::BIGINT AS n_closed_vertices
    FROM per_vertex
"""


_TRIANGLE_ORACLE = f"""
    WITH {EDGES_CTE},
    o AS (SELECT src, dst FROM e WHERE src < dst),
    deg AS (SELECT src AS id, count(*) AS degree FROM e GROUP BY src),
    t AS (
        SELECT count(*)::BIGINT AS n_triangles
        FROM o x JOIN o y ON y.src = x.dst
                 JOIN o z ON z.src = x.src AND z.dst = y.dst
    ),
    w AS (
        SELECT (sum(degree * (degree - 1)) / 2)::BIGINT AS n_wedges,
               (sum(degree) / 2)::BIGINT AS n_edges
        FROM deg
    )
    SELECT n_triangles, n_wedges, n_edges,
           CASE WHEN n_wedges > 0
                THEN round(3.0 * n_triangles / n_wedges, 6)
                ELSE 0.0 END AS global_clustering
    FROM t CROSS JOIN w
"""


def pagerank_customers(
    spark: SparkSession,
    sf_dir: str,
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """PageRank over ALL customers (isolated ones included as dangling
    nodes) → (id, pagerank), ranks summing to 1.

    Update rule per iteration (the standard dangling-mass formulation):

        rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/out_deg(u) + D/N)

    where D = Σ rank(u) over dangling (degree-0) u.  D enters the plan
    as a broadcast one-row aggregate, NOT a driver collect — the loop
    body is action-free and each iteration's state is a lazily
    checkpointed leaf, exactly the coloring core's regime.
    """
    edges = customer_graph_edges(spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    verts = (
        cu.join(degrees(edges), "id", "left")
        .select("id", F.coalesce("degree", F.lit(0)).alias("out_deg"))
    )
    n = verts.count()
    ranks = pagerank_ranks(verts, edges, n, iterations, damping)
    return ranks.select("id", F.col("rank").alias("pagerank"))


def pagerank_ranks(
    verts: DataFrame,
    edges: DataFrame,
    n: int,
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """The reusable PageRank loop over ANY (id, out_deg) vertex frame +
    symmetric edges(src, dst) frame with ``n`` total vertices →
    (id, out_deg, rank).  Same loop discipline as the module docstring;
    also driven at 10× graph sizes by tools/scale_probe_graph.py."""
    spark = verts.sparkSession
    with scoped_shuffle_partitions(spark, n):
        ranks = verts.select("id", "out_deg", F.lit(1.0 / n).alias("rank"))
        for _ in range(iterations):
            dangling = ranks.filter(F.col("out_deg") == 0).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
            )
            shares = ranks.filter(F.col("out_deg") > 0).select(
                F.col("id").alias("src"), (F.col("rank") / F.col("out_deg")).alias("share")
            )
            contribs = (
                edges.join(shares, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("share").alias("contrib"))
            )
            ranks = (
                verts.join(contribs, "id", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "id",
                    "out_deg",
                    (
                        F.lit((1.0 - damping) / n)
                        + damping
                        * (
                            F.coalesce("contrib", F.lit(0.0))
                            + F.col("dangling_mass") / n
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
        # Materialize INSIDE the scope (review r5): the loop body is
        # deliberately action-free, so without an action here all 10
        # iterations' shuffles would execute at the caller's terminal
        # action — after the with-block restored the session-wide
        # shuffle width, silently undoing the |V|-scoped clamp.
        _materialize(ranks)
    return ranks


_PPR_SEED_CUT = 20  # seed set = customers with id < 20 (deterministic)


def ppr_customers(
    spark: SparkSession,
    sf_dir: str,
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """PERSONALIZED PageRank from a fixed seed set (ids < 20) — the
    recsys/graph-retrieval variant: teleport (and the dangling mass)
    returns to the SEEDS instead of the uniform vector, so scores rank
    proximity to the seed neighborhood rather than global centrality:

        rank'(v) = (1−d)·tele(v) + d·(Σ_{u→v} rank(u)/deg(u) + D·tele(v))

    with tele = 1/|S| on seeds, 0 elsewhere.  Same action-free loop
    discipline as pagerank_customers (broadcast 1-row dangling mass,
    lazy checkpoint per round, noop-write materialization inside the
    |V|-scoped width); the teleport vector is a literal CASE column, so
    the only new state is one comparison per row.  Mass is conserved
    (Σ rank = 1) — pinned, with a python power-iteration twin, in
    tests/test_graph_analytics.py."""
    edges = customer_graph_edges(spark, sf_dir)
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    verts = cu.join(degrees(edges), "id", "left").select(
        "id", F.coalesce("degree", F.lit(0)).alias("out_deg")
    )
    n_seeds = verts.filter(F.col("id") < _PPR_SEED_CUT).count()
    if n_seeds == 0:  # same style as color_graph_attempt's k < 1 guard
        raise ValueError(
            f"ppr_customers: no seed vertices (no customer id < {_PPR_SEED_CUT}) "
            "— personalized teleport needs a non-empty seed set"
        )
    tele = F.when(F.col("id") < _PPR_SEED_CUT, F.lit(1.0 / n_seeds)).otherwise(0.0)
    spark_ = verts.sparkSession
    with scoped_shuffle_partitions(spark_, verts.count()):
        ranks = verts.select("id", "out_deg", tele.alias("rank"))
        for _ in range(iterations):
            dangling = ranks.filter(F.col("out_deg") == 0).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
            )
            shares = ranks.filter(F.col("out_deg") > 0).select(
                F.col("id").alias("src"),
                (F.col("rank") / F.col("out_deg")).alias("share"),
            )
            contribs = (
                edges.join(shares, "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("share").alias("contrib"))
            )
            ranks = (
                verts.join(contribs, "id", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "id",
                    "out_deg",
                    (
                        (1.0 - damping) * tele
                        + damping
                        * (
                            F.coalesce("contrib", F.lit(0.0))
                            + F.col("dangling_mass") * tele
                        )
                    ).alias("rank"),
                )
                .localCheckpoint(eager=False)
            )
        _materialize(ranks)
    return ranks.select("id", F.col("rank").alias("ppr"))


def ppr_reference(
    edge_list: list[tuple[int, int]],
    vertex_ids: list[int],
    seeds: list[int],
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
) -> dict[int, float]:
    """Driver-side personalized power iteration — the non-Spark oracle
    for ``ppr_customers``.  Test-sized inputs only."""
    out_deg: dict[int, int] = {v: 0 for v in vertex_ids}
    for s, _ in edge_list:
        out_deg[s] += 1
    tele = {v: (1.0 / len(seeds) if v in set(seeds) else 0.0) for v in vertex_ids}
    rank = dict(tele)
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if out_deg[v] == 0)
        contrib: dict[int, float] = {v: 0.0 for v in vertex_ids}
        for s, d in edge_list:
            contrib[d] += rank[s] / out_deg[s]
        rank = {
            v: (1.0 - damping) * tele[v]
            + damping * (contrib[v] + dangling * tele[v])
            for v in vertex_ids
        }
    return rank


def pagerank_reference(
    edge_list: list[tuple[int, int]],
    vertex_ids: list[int],
    iterations: int = PAGERANK_ITERATIONS,
    damping: float = PAGERANK_DAMPING,
) -> dict[int, float]:
    """Driver-side power iteration over plain dicts — the non-Spark
    oracle for ``pagerank_customers`` (same update rule, same fixed
    iteration count).  Test-sized inputs only."""
    out_deg: dict[int, int] = {v: 0 for v in vertex_ids}
    for s, _ in edge_list:
        out_deg[s] += 1
    n = len(vertex_ids)
    rank = {v: 1.0 / n for v in vertex_ids}
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if out_deg[v] == 0)
        contrib: dict[int, float] = {v: 0.0 for v in vertex_ids}
        for s, d in edge_list:
            contrib[d] += rank[s] / out_deg[s]
        rank = {
            v: (1.0 - damping) / n + damping * (contrib[v] + dangling / n)
            for v in vertex_ids
        }
    return rank


# pytest-gated (the driver registry is capped at 50 entries):
# triangle_count under its DuckDB oracle, pagerank under the pure-Python
# power-iteration oracle (float fixpoint — not hash-comparable).
PYTEST_QUERIES = {
    "triangle_count": triangle_count,
    "pagerank_customers": pagerank_customers,
    "graph_ppr_seeded": ppr_customers,
    "graph_components": graph_components,
    "graph_communities": graph_communities,
    "graph_modularity": graph_modularity,
    "graph_local_clustering": graph_local_clustering,
    "graph_bfs_distances": graph_bfs_distances,
    "graph_kcore": graph_kcore,
    "graph_sssp_weighted": graph_sssp_weighted,
    "graph_assortativity": graph_assortativity,
}

PYTEST_ORACLES = {
    "triangle_count": _TRIANGLE_ORACLE,
    "graph_components": _COMPONENTS_ORACLE,
    "graph_communities": _LPA_ORACLE,
    "graph_modularity": _MODULARITY_ORACLE,
    "graph_local_clustering": _LOCAL_CLUSTERING_ORACLE,
    "graph_bfs_distances": _BFS_ORACLE,
    "graph_assortativity": _ASSORTATIVITY_ORACLE,
}

# Round-11 rotation (VERDICT r10 #5): graph_assortativity — the FIRST
# graph-analytics row ever in the driver registry (this module was
# wholly pytest-gated by the 50-row cap) — takes the driver row
# multimodal_blob_stats frees; same DuckDB oracle (corr over the
# identical edge CTE), now value-hashed by the driver at sf0.01.
QUERIES = {"graph_assortativity": PYTEST_QUERIES.pop("graph_assortativity")}
ORACLES = {"graph_assortativity": PYTEST_ORACLES.pop("graph_assortativity")}

# Round-12 rotation (VERDICT r11 #5): graph_local_clustering — the
# per-degree-bucket local clustering coefficient, DuckDB-oracled at the
# pytest gate since r9 and never driver-exposed — takes the row
# events_key_skew_report frees in streaming/events.py.
QUERIES["graph_local_clustering"] = PYTEST_QUERIES.pop("graph_local_clustering")
ORACLES["graph_local_clustering"] = PYTEST_ORACLES.pop("graph_local_clustering")

# Round-14 rotation (VERDICT r13 #5): triangle_count — the
# degree-ordered-orientation triangle counter, DuckDB-oracled at the
# pytest gate since r6 and never driver-exposed (the oracle counts via
# the independent id-ordered orientation, so the driver hash
# cross-checks the two orientations) — takes the driver row
# events_props_variant frees in streaming/events.py.
QUERIES["triangle_count"] = PYTEST_QUERIES.pop("triangle_count")
ORACLES["triangle_count"] = PYTEST_ORACLES.pop("triangle_count")
