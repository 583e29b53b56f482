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
