"""Meta-blocking: hand-computed CBS/WNP example, cap linearity on an
injected hot class, partitioning invariance, recall on exact dups."""

from pyspark.sql import functions as F

from berkeley_entity_spark.operators.metablocking import (
    block_graph_edges,
    doc_block_keys,
    meta_blocking_pairs,
    wnp_prune,
)


def _keys(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, block_key string")


def test_cbs_and_wnp_hand_computed(spark):
    # blocks: k1={1,2,3}, k2={1,2}, k3={2,3}
    # edges: (1,2) shares k1,k2 -> cbs 2; (1,3) shares k1 -> 1; (2,3) k1,k3 -> 2
    keys = _keys(
        spark,
        [(1, "k1"), (2, "k1"), (3, "k1"), (1, "k2"), (2, "k2"), (2, "k3"), (3, "k3")],
    )
    edges = {(r["id_a"], r["id_b"]): r["cbs"] for r in block_graph_edges(keys).collect()}
    assert edges == {(1, 2): 2, (1, 3): 1, (2, 3): 2}
    # node means: 1 -> (2+1)/2=1.5; 2 -> (2+2)/2=2; 3 -> (1+2)/2=1.5
    # (1,2): 2 >= 1.5 keep; (1,3): 1 < 1.5 and 1 < 1.5 prune; (2,3): keep
    kept = {
        (r["id_a"], r["id_b"])
        for r in wnp_prune(block_graph_edges(keys)).collect()
    }
    assert kept == {(1, 2), (2, 3)}


def test_hot_block_cap_linear(spark):
    # 500 ids in one degenerate key, cap 10 -> exactly C(10,2)=45 edges
    keys = _keys(spark, [(i, "hot") for i in range(500)])
    assert block_graph_edges(keys, max_block=10).count() == 45
    # cap is by ascending id: members are 0..9
    mx = block_graph_edges(keys, max_block=10).agg(F.max("id_b")).collect()[0][0]
    assert mx == 9


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} mid{i} tail{i % 5} " + "x " * (i % 30)) for i in range(80)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, meta_blocking_pairs(docs).collect()))
    b = sorted(map(tuple, meta_blocking_pairs(docs.repartition(13)).collect()))
    assert a == b and len(a) > 0


def test_exact_dups_survive_pruning(spark):
    # exact dups share all three keys (cbs=3, the max) -> WNP must keep them
    base = [(i, f"alpha{i} beta gamma delta{i}") for i in range(20)]
    dups = [(i + 1000, t) for i, t in base[:5]]
    docs = spark.createDataFrame(base + dups, "doc_id long, text string")
    kept = {
        (r["id_a"], r["id_b"])
        for r in meta_blocking_pairs(docs).collect()
    }
    for i in range(5):
        assert (i, i + 1000) in kept


def test_doc_block_keys_shape(spark):
    docs = spark.createDataFrame([(1, "a b c"), (2, "")], "doc_id long, text string")
    rows = doc_block_keys(docs).collect()
    got = {(r["doc_id"], r["block_key"]) for r in rows}
    assert got == {(1, "F:a"), (1, "L:c"), (1, "B:0")}
