"""Graph analytics beyond dedup clustering: BFS, k-core, link
prediction, label-propagation communities.

The dedup module owns the graph shapes the duplicate pipeline needs
(connected components, triangles, PageRank); this module adds the
general graph-analytics operators a training-data pipeline reaches for
when it treats its corpus as a graph — crawl-frontier reachability
(BFS), spam-farm / boilerplate-kernel extraction (k-core),
citation/link prediction (common-neighbor scoring), and community
detection that a single bridge edge does not collapse
(label_propagation).

All four keep the properties the rest of the repo's iterative
operators pin:

* integer-exact state (hop counts, degrees, ppm-scaled ratios) so the
  value-hash oracle can compare bit-for-bit across engines;
* per-round shuffles keyed on node ids only — the edge relation is
  hash-partitioned once (``localCheckpoint``) and never re-shipped;
* lineage truncation per round, bounded driver-side convergence
  probes (``limit(1).count()`` / edge-count compare), no collect of
  any O(V) or O(E) state.

Reference parity: the reference pipeline has no graph engine at all —
these cover the "beyond the reference: large-scale training-data
pipeline" bucket (SURVEY.md §2 addendum), same as operators/dedup.py's
graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geohub_data_pipeline_spark.localdata import local_df
from geohub_data_pipeline_spark.operators.skew import fits_one_task

# r12: every operator in this module gates its synchronous driver
# loop on the MATERIALIZED edge relation's partition count (the r11
# halo-engine / classifier P=1 pattern, guide §1.2/§2).  When the
# checkpointed edges landed in ONE partition, each round's 2-stage
# job only exchanges data with itself while paying the full
# job-dispatch floor (measured r12 at sf0.01, 32 cores:
# graph_bfs_hops 67 jobs / 10.6 s, graph_sssp_weighted 99 jobs /
# 6.1 s, graph_kcore 28 jobs / 2.4 s, graph_label_propagation 23
# jobs / 2.5 s — scripts/probe_iterative_jobs.py).  The local paths
# run the IDENTICAL round schedule (same synchronous updates, same
# convergence probes, same loud caps — all state is integer-exact,
# so the emitted rows are bit-identical; pinned per operator by a
# forced-distributed parity pytest) inside one task via mapInPandas.
# At real scale the materialized relation spans many partitions and
# the distributed loops below run unchanged.
_fits_one_task = fits_one_task


def bfs_hops(edges: DataFrame, source: int, src: str = "src",
             dst: str = "dst", max_hops: int = 20) -> DataFrame:
    """Single-source shortest HOP counts over a directed graph by
    frontier-expansion BFS — ``(node, hop)`` for every node reachable
    from ``source`` within ``max_hops`` (the source itself at hop 0).

    Each round joins the current frontier against the edge list and
    anti-joins the visited set, so a node is labeled the first time
    it is reached — which IS its shortest hop distance, making the
    result exactly ``min(hop)`` over all paths (what the recursive-CTE
    oracle computes) without ever enumerating multiple paths.

    Scale: the edge list is materialized once (``localCheckpoint``)
    and re-used every round; per round the only moving state is the
    frontier (worst case O(V), typically a thin BFS layer) through
    one hash join keyed on src and one anti-join keyed on node.
    Frontier emptiness is the convergence probe (``limit(1).count()``,
    stops at the first row).  No path enumeration, no driver-side
    graph state — a 100 TB edge relation behind the same O(layer)
    exchanges.
    """
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("t"))
         .filter(F.col("s") != F.col("t"))
         .distinct()
         .localCheckpoint())
    if _fits_one_task(e):
        # in-task fixpoint: identical layer schedule (first-reach =
        # min hop), identical truncation probe and RAISE — the raise
        # now surfaces at ACTION time wrapped in Spark's Python
        # exception, message preserved
        src0, cap = int(source), int(max_hops)

        def _run(it):
            import pandas as pd

            adj: dict = {}
            for pdf in it:
                for s, t in zip(pdf["s"].to_numpy(),
                                pdf["t"].to_numpy()):
                    adj.setdefault(int(s), []).append(int(t))
            vis = {src0: 0}
            frontier: set = {src0}
            converged = False
            for hop in range(1, cap + 1):
                nxt = {t for n in frontier for t in adj.get(n, ())
                       if t not in vis}
                if not nxt:
                    converged = True
                    break
                for t in nxt:
                    vis[t] = hop
                frontier = nxt
            if not converged and any(
                    t not in vis
                    for n in frontier for t in adj.get(n, ())):
                raise RuntimeError(
                    f"bfs_hops: frontier still expanding after "
                    f"max_hops={cap} rounds — reachability set would "
                    f"be truncated; raise max_hops")
            yield pd.DataFrame({"node": list(vis),
                                "hop": list(vis.values())},
                               dtype="int64")

        return e.mapInPandas(_run, "node long, hop long")
    visited = (local_df(e.sparkSession, [(int(source), 0)],
                        "node long, hop int")
               .localCheckpoint())
    frontier = visited
    converged = False
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier["node"] == e["s"])
               .select(F.col("t").alias("node"))
               .distinct()
               .join(visited, "node", "left_anti")
               .withColumn("hop", F.lit(hop))
               .localCheckpoint())
        if nxt.limit(1).count() == 0:
            converged = True
            break
        # visited stays a LAZY union of already-checkpointed
        # frontiers: no per-round materialization job, and the plan
        # is a flat union over <= max_hops checkpointed layers
        visited = visited.unionByName(nxt)
        frontier = nxt
    if not converged:
        # One extra probe: a truncated reachability set is
        # indistinguishable from a converged one, so — like
        # kcore_members and sssp_bellman_ford — RAISE loudly when
        # reachable nodes remain past the cap instead of returning a
        # wrong-but-plausible subset.
        remaining = (frontier.join(e, frontier["node"] == e["s"])
                     .select(F.col("t").alias("node"))
                     .distinct()
                     .join(visited, "node", "left_anti"))
        if remaining.limit(1).count() != 0:
            raise RuntimeError(
                f"bfs_hops: frontier still expanding after "
                f"max_hops={max_hops} rounds — reachability set would "
                f"be truncated; raise max_hops")
    return visited.select("node", F.col("hop").cast("long").alias("hop"))


def kcore_members(edges: DataFrame, k: int, src: str = "id_a",
                  dst: str = "id_b", max_iters: int = 30) -> DataFrame:
    """The k-core of an undirected graph — the maximal subgraph in
    which every node has degree >= k — by iterative peeling: drop all
    nodes with degree < k, recompute degrees in what remains, repeat
    to fixpoint.  The peel is monotone (the alive edge set only
    shrinks), so the fixpoint is unique and equals the standard
    k-core regardless of round grouping — which is what lets a
    round-unrolled SQL oracle reproduce it exactly.  If the peel
    has not converged within ``max_iters`` rounds the function
    RAISES rather than return the (wrong) intermediate set — long
    path-like graphs peel only their endpoints each round, so the
    cap is reachable on legitimate inputs.

    Scale: per round one degree aggregation (groupBy node) and two
    semi-joins of the edge list against the surviving vertex set, all
    keyed on node ids; ``localCheckpoint`` truncates lineage and the
    convergence probe compares alive-edge counts (a count(), not a
    collect).  Degree skew is harmless here — peeling only ever
    *removes* low-degree nodes, hubs never fan anything out.

    Returns ``(node, core_degree)`` — members of the k-core with
    their degree inside the core, the number production spam-kernel
    extraction thresholds on.
    """
    alive = (edges.select(F.col(src).cast("long").alias("u"),
                          F.col(dst).cast("long").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .select(F.least("u", "v").alias("u"),
                     F.greatest("u", "v").alias("v"))
             .distinct()
             .localCheckpoint())
    if _fits_one_task(alive):
        # in-task peel: same simultaneous-peel rounds, same
        # convergence rule (alive-edge count unchanged or zero),
        # same loud cap (RAISE surfaces at action time)
        k0, cap = int(k), int(max_iters)

        def _run(it):
            import pandas as pd

            E: set = set()
            for pdf in it:
                E.update(zip(pdf["u"].astype("int64"),
                             pdf["v"].astype("int64")))
            E = {(int(a), int(b)) for a, b in E}
            n_alive = len(E)
            converged = n_alive == 0
            for _ in range(cap):
                if converged:
                    break
                deg: dict = {}
                for a, b in E:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
                keep = {x for x, d in deg.items() if d >= k0}
                nxt = {(a, b) for a, b in E
                       if a in keep and b in keep}
                n_nxt = len(nxt)
                converged = n_nxt == n_alive or n_nxt == 0
                E = nxt
                n_alive = n_nxt
            if not converged:
                raise RuntimeError(
                    f"k-core peel did not reach its fixpoint within "
                    f"{cap} rounds ({n_alive} edges still alive); "
                    f"raise max_iters")
            cd: dict = {}
            for a, b in E:
                cd[a] = cd.get(a, 0) + 1
                cd[b] = cd.get(b, 0) + 1
            yield pd.DataFrame({"node": list(cd),
                                "core_degree": list(cd.values())},
                               dtype="int64")

        return alive.mapInPandas(_run, "node long, core_degree long")
    n_alive = alive.count()
    converged = n_alive == 0
    for _ in range(max_iters):
        if converged:
            break
        deg = (alive.select(F.col("u").alias("node"))
               .unionAll(alive.select(F.col("v").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("d")))
        keep = deg.filter(F.col("d") >= k).select("node")
        nxt = (alive
               .join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
               .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
               .select("u", "v")
               .localCheckpoint())
        n_nxt = nxt.count()
        converged = n_nxt == n_alive or n_nxt == 0
        alive = nxt
        n_alive = n_nxt
    if not converged:
        # a silent cap-exit would return a superset that is NOT the
        # k-core (e.g. a long path peels two endpoints per round);
        # wrong-but-plausible is worse than loud
        raise RuntimeError(
            f"k-core peel did not reach its fixpoint within "
            f"{max_iters} rounds ({n_alive} edges still alive); "
            f"raise max_iters")
    return (alive.select(F.col("u").alias("node"))
            .unionAll(alive.select(F.col("v").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("core_degree")))


def common_neighbor_pairs(edges: DataFrame, min_common: int = 2,
                          src: str = "id_a", dst: str = "id_b",
                          deg_cap: int = 32) -> DataFrame:
    """Link prediction by common-neighbor counting: for every node
    pair (a, b), a < b, the number of shared neighbors and the
    neighborhood-Jaccard in exact parts-per-million —
    ``jaccard_ppm = (1_000_000 * common) div (deg(a)+deg(b)-common)``
    (integer division, so bit-exact across engines).

    The pair fan-out comes from a wedge self-join keyed on the shared
    MIDDLE node, so a middle of degree d emits C(d, 2) pairs; middles
    with degree > ``deg_cap`` are excluded from wedge formation (the
    standard link-prediction move — a hub shared by everyone carries
    no signal, and C(hub_degree, 2) is exactly the blow-up that kills
    the join at 100 TB).  Pair degrees (for the Jaccard denominator)
    still count ALL neighbors, capped middles included.

    Plan: one degree aggregation, one semi-join to drop capped
    middles, one middle-keyed self-join, one (a, b) count shuffle,
    two broadcast-sized degree joins.  Output:
    ``(node_a, node_b, common_cnt, jaccard_ppm)``.
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .select(F.least("u", "v").alias("u"),
                 F.greatest("u", "v").alias("v"))
         .distinct())
    adj = (e.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
           .unionAll(e.select(F.col("v").alias("node"),
                              F.col("u").alias("nbr"))))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    ok_mid = (deg.filter(F.col("d") <= deg_cap)
              .select(F.col("node").alias("nbr")))
    wedge_adj = adj.join(ok_mid, "nbr", "left_semi")
    a = wedge_adj.select(F.col("node").alias("node_a"), "nbr")
    b = wedge_adj.select(F.col("node").alias("node_b"), "nbr")
    pairs = (a.join(b, "nbr")
             .filter(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(F.count(F.lit(1)).alias("common_cnt"))
             .filter(F.col("common_cnt") >= min_common))
    da = deg.select(F.col("node").alias("node_a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("node_b"), F.col("d").alias("db"))
    return (pairs.join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "common_cnt",
                    F.expr("(1000000 * common_cnt) div "
                           "(da + db - common_cnt)").alias("jaccard_ppm")))


def label_propagation(edges: DataFrame, rounds: int = 3,
                      src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan
    et al. 2007), made DETERMINISTIC: every node starts labeled with
    itself; each round it adopts the label with the highest vote
    count among its neighbors PLUS its own current label, ties
    broken by the smaller label.  The classic LPA breaks ties
    randomly; the (count desc, label asc) rule makes the same input
    produce the same communities on any engine/partitioning — the
    oracle requirement — while keeping the community behavior
    connected components cannot give (a single bridge edge does NOT
    merge two dense blocks, because one vote loses to many).

    Runs a FIXED number of synchronous rounds (callers pick small
    rounds; LPA famously converges in ~5), so a round-unrolled SQL
    oracle can reproduce it exactly — no convergence probe needed.

    Scale per round: one edge-to-label join keyed on the neighbor
    id, one (node, label) vote count, one per-node argmax window —
    all shuffles keyed on node ids, label state is O(V), edges are
    checkpointed once and never re-shipped.

    Returns ``(node, label)``.
    """
    from pyspark.sql.window import Window

    sym = (edges.select(F.col(src).cast("long").alias("u"),
                        F.col(dst).cast("long").alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.least("u", "v").alias("u"),
                   F.greatest("u", "v").alias("v"))
           .distinct()
           .localCheckpoint())
    if _fits_one_task(sym):
        # in-task rounds: same synchronous vote tally, same
        # (count desc, label asc) argmax — integer-exact.  The
        # symmetric adjacency is derived in-task from the undirected
        # edge list (exactly what the distributed union below does).
        r0 = int(rounds)

        def _run(it):
            import pandas as pd

            nbrs: dict = {}
            for pdf in it:
                for u, v in zip(pdf["u"].to_numpy(),
                                pdf["v"].to_numpy()):
                    nbrs.setdefault(int(u), []).append(int(v))
                    nbrs.setdefault(int(v), []).append(int(u))
            lab = {n: n for n in nbrs}
            for _ in range(r0):
                new = {}
                for n, ms in nbrs.items():
                    votes: dict = {lab[n]: 1}
                    for m in ms:
                        lm = lab[m]
                        votes[lm] = votes.get(lm, 0) + 1
                    new[n] = min(votes.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[0]
                lab = new
            yield pd.DataFrame({"node": list(lab),
                                "label": list(lab.values())},
                               dtype="int64")

        return sym.mapInPandas(_run, "node long, label long")
    # adj derives from the CHECKPOINTED sym (narrow union of two
    # selects over materialized rows), so the per-round joins never
    # re-run the upstream lineage
    adj = (sym.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
           .unionAll(sym.select(F.col("v").alias("node"),
                                F.col("u").alias("nbr"))))
    labels = (adj.select("node").distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint())
    w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        nbr_votes = (adj.join(
            labels.withColumnRenamed("node", "nbr"), "nbr")
            .select("node", "label"))
        votes = nbr_votes.unionAll(labels.select("node", "label"))
        tally = (votes.groupBy("node", "label")
                 .agg(F.count(F.lit(1)).alias("c")))
        labels = (tally.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .select("node", "label")
                  .localCheckpoint())
    return labels


def sssp_bellman_ford(edges: DataFrame, source: int,
                      src: str = "src", dst: str = "dst",
                      weight: str = "w",
                      max_rounds: int = 40) -> DataFrame:
    """Single-source shortest WEIGHTED paths by distributed
    Bellman-Ford relaxation: each round extends every currently
    reached node's distance across its out-edges and folds with
    min() — the min-plus matrix-vector step — until no distance
    improves.  Weights are non-negative INTEGERS (caller contract),
    so distances are exact and the fixpoint is the true shortest
    path cost; convergence takes at most (longest shortest path's
    edge count) rounds.

    Complements ``bfs_hops`` (unit weights): BFS's first-reach
    trick is wrong under weights — a later-relaxed path may be
    cheaper — so state here is (node, best-so-far) and rounds fold
    with min.  Like ``kcore_members``, the cap is loud: if the
    relaxation has not converged within ``max_rounds`` the function
    RAISES rather than return inflated distances.

    Scale per round: one edge-keyed join of the distance vector
    (O(reached)), one groupBy(node) min — shuffles keyed on node
    ids; edges are checkpointed once.  The convergence probe joins
    successive vectors and stops at the first improved row.

    Returns ``(node, dist)`` over reached nodes.
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"),
                      F.col(weight).cast("long").alias("w"))
         .filter(F.col("u") != F.col("v"))
         .groupBy("u", "v").agg(F.min("w").alias("w"))
         .localCheckpoint())
    if _fits_one_task(e):
        # in-task min-plus rounds: same synchronous relaxation from
        # the PREVIOUS round's vector, same improvement probe and
        # loud cap — integer distances, bit-identical fixpoint
        src0, cap = int(source), int(max_rounds)

        def _run(it):
            import pandas as pd

            adj: dict = {}
            for pdf in it:
                for u, v, w in zip(pdf["u"].to_numpy(),
                                   pdf["v"].to_numpy(),
                                   pdf["w"].to_numpy()):
                    adj.setdefault(int(u), []).append((int(v), int(w)))
            dist = {src0: 0}
            converged = False
            for _ in range(cap):
                new = dict(dist)
                for u, d in dist.items():
                    for v, w in adj.get(u, ()):
                        nd = d + w
                        if nd < new.get(v, nd + 1):
                            new[v] = nd
                improved = any(dist.get(n) is None or d < dist[n]
                               for n, d in new.items())
                dist = new
                if not improved:
                    converged = True
                    break
            if not converged:
                raise RuntimeError(
                    f"Bellman-Ford did not converge within {cap} "
                    f"rounds; raise max_rounds")
            yield pd.DataFrame({"node": list(dist),
                                "dist": list(dist.values())},
                               dtype="int64")

        return e.mapInPandas(_run, "node long, dist long")
    dist = (local_df(e.sparkSession, [(int(source), 0)],
                     "node long, dist long")
            .localCheckpoint())
    converged = False
    for _ in range(max_rounds):
        cand = (e.join(dist.withColumnRenamed("node", "u"), "u")
                .select(F.col("v").alias("node"),
                        (F.col("dist") + F.col("w")).alias("dist")))
        new = (dist.unionByName(cand)
               .groupBy("node").agg(F.min("dist").alias("dist"))
               .localCheckpoint())
        improved = (new.join(
            dist.withColumnRenamed("dist", "__old"), "node", "left")
            .filter(F.col("__old").isNull()
                    | (F.col("dist") < F.col("__old")))
            .limit(1).count())
        dist = new
        if improved == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"Bellman-Ford did not converge within {max_rounds} "
            f"rounds; raise max_rounds")
    return dist
