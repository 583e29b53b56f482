"""Dedup clustering: connected components over verified pairs."""

from __future__ import annotations

from geohub_data_pipeline_spark.operators import dedup as D


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_chain_and_islands(spark):
    """A 4-node chain (diameter 3), a 2-node pair, and a triangle all
    collapse to their min id; no cross-component leakage."""
    e = _edges(spark, [
        (1, 2), (2, 3), (3, 4),          # chain
        (10, 11),                        # pair
        (20, 21), (21, 22), (20, 22),    # triangle
    ])
    got = {r.node: r.label for r in D.connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_cc_partition_invariant_and_direction_agnostic(spark):
    """Labels are identical whichever way edges point and however the
    input is partitioned."""
    pairs = [(5, 1), (2, 5), (9, 2), (7, 8)]
    a = {r.node: r.label
         for r in D.connected_components(_edges(spark, pairs)).collect()}
    b = {r.node: r.label
         for r in D.connected_components(
             _edges(spark, [(y, x) for x, y in pairs]).repartition(7))
         .collect()}
    assert a == b == {1: 1, 2: 1, 5: 1, 9: 1, 7: 7, 8: 7}


def test_cc_empty_edges(spark):
    assert D.connected_components(_edges(spark, [])).count() == 0

def test_altcc_matches_hash_to_min(spark):
    """Large-star/small-star produces the exact same (node, label) map
    as hash-to-min on mixed component shapes."""
    pairs = [
        (1, 2), (2, 3), (3, 4),          # chain
        (10, 11),                        # pair
        (20, 21), (21, 22), (20, 22),    # triangle
        (30, 31), (31, 30),              # duplicate reversed edge
    ]
    a = {r.node: r.label
         for r in D.connected_components(_edges(spark, pairs)).collect()}
    b = {r.node: r.label
         for r in D.alternating_cc(_edges(spark, pairs)).collect()}
    assert a == b


def test_altcc_deep_chain_few_rounds(spark):
    """A 33-node chain (diameter 32) — hash-to-min's worst case —
    converges within O(log n) alternating rounds and still labels
    every node with the chain min."""
    pairs = [(i, i + 1) for i in range(100, 132)]
    got = {r.node: r.label
           for r in D.alternating_cc(_edges(spark, pairs),
                                     max_iters=7).collect()}
    assert got == {i: 100 for i in range(100, 133)}


def test_altcc_empty_and_star(spark):
    assert D.alternating_cc(_edges(spark, [])).count() == 0
    got = {r.node: r.label
           for r in D.alternating_cc(
               _edges(spark, [(50, 51), (50, 52), (50, 53)])).collect()}
    assert got == {50: 50, 51: 50, 52: 50, 53: 50}


def test_cc_algorithms_agree_on_random_graphs(spark):
    """On seeded random graphs, hash-to-min, alternating large/small
    star, and a driver-side union-find ground truth all produce the
    identical (node -> component-min) map."""
    import random

    for seed in (7, 42, 99):
        rng = random.Random(seed)
        n = 60
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        pairs = [(a, b) for a, b in pairs if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for p in pairs for x in p}
        truth = {x: find(x) for x in nodes}

        e = _edges(spark, pairs)
        htm = {r.node: r.label
               for r in D.connected_components(e).collect()}
        alt = {r.node: r.label
               for r in D.alternating_cc(e).collect()}
        assert htm == truth, f"hash-to-min diverges (seed {seed})"
        assert alt == truth, f"alternating diverges (seed {seed})"


def test_triangle_counts_matches_brute_force(spark):
    """Degree-oriented wedge counting equals the brute-force
    enumeration on a random graph (duplicates, reversed edges, and
    self-loops in the input), and the plan has no cartesian
    product."""
    import itertools
    import random

    from geohub_data_pipeline_spark.operators.dedup import (
        triangle_counts,
    )

    rng = random.Random(7)
    nodes = list(range(30))
    edges = set()
    while len(edges) < 90:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    rows = []
    for a, b in edges:
        rows.append((a, b))
        if rng.random() < 0.3:
            rows.append((b, a))           # reversed duplicate
    rows += [(5, 5), (7, 7)]              # self-loops: ignored
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {r.node: r.n_triangles
           for r in triangle_counts(df).collect()}

    brute = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if ({(a, b), (a, c), (b, c)} <= edges):
            for n in (a, b, c):
                brute[n] = brute.get(n, 0) + 1
    assert got == brute
    plan = (triangle_counts(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan

