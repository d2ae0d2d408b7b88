"""Connected components vs a union-find oracle."""

import random

from pyspark.sql import functions as F

from berkeley_entity_spark.operators.clustering import connected_components


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical min id per component
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, set()).add(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_cc_matches_union_find(spark):
    rng = random.Random(7)
    nodes = [rng.randrange(-(2**40), 2**40) for _ in range(300)]
    edges = []
    # mixed topology: chains, stars, cliques-ish, singetons left out
    for i in range(0, 200, 10):
        chain = nodes[i : i + 10]
        edges += list(zip(chain, chain[1:]))
    hub = nodes[200]
    edges += [(hub, nodes[201 + i]) for i in range(30)]
    for i in range(240, 290, 5):
        grp = nodes[i : i + 5]
        edges += [(a, b) for a in grp for b in grp if a < b]
    rng.shuffle(edges)

    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r["node_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    expected = _union_find_components(edges)
    assert got == expected


def test_cc_converges_on_long_chain(spark):
    # pathological chain ordered against the grain: needs O(log n) rounds
    n = 200
    edges = [(i + 1, i) for i in range(n)]
    df = spark.createDataFrame(edges, "u long, v long")
    comp = connected_components(df, max_iterations=30)
    vals = comp.select(F.countDistinct("component")).collect()[0][0]
    assert vals == 1
    assert comp.count() == n + 1


def test_cc_distributed_loop_matches_driver_finish(spark):
    """The large/small-star loop (small_graph_threshold=0 forces it) and the
    hybrid driver-side union-find finish must produce identical mappings on
    the same mixed-topology graph, for several partitionings."""
    rng = random.Random(13)
    nodes = [rng.randrange(-(2**40), 2**40) for _ in range(150)]
    edges = []
    for i in range(0, 100, 10):
        chain = nodes[i : i + 10]
        edges += list(zip(chain, chain[1:]))
    hub = nodes[100]
    edges += [(hub, nodes[101 + i]) for i in range(20)]
    edges += [(nodes[130], nodes[131]), (nodes[131], nodes[130])]  # dupes
    rng.shuffle(edges)
    for n_parts in (1, 5):
        df = spark.createDataFrame(edges, "u long, v long").repartition(n_parts)
        via_loop = {
            r["node_id"]: r["component"]
            for r in connected_components(df, small_graph_threshold=0).collect()
        }
        via_driver = {
            r["node_id"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert via_loop == via_driver
        assert via_loop == _union_find_components(edges)
