from __future__ import annotations

import duckdb
import numpy as np

from berkeley_entity_spark.operators.similarity import semdedup


def _emb(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>",
    )


def test_semdedup_constructed_groups(spark):
    """Two tight duplicate groups + one singleton, all in one cluster:
    each group keeps exactly its least-prototypical member."""
    dim = 4
    # centroid space is the seeded anchor matrix; any vectors work — the
    # grouping is driven by pairwise cosine, the representative by cos_c.
    base_a = np.array([1.0, 0.02, 0.0, 0.0])
    base_b = np.array([0.0, 0.0, 1.0, 0.03])
    # power-of-two scalings are bit-exact through unit-normalization, so
    # every group member has IDENTICAL cos_c and the tie-break is min id
    rows = [
        (1, base_a),
        (2, base_a * 2.0),            # cosine 1 with id 1
        (3, base_a * 4.0),
        (10, base_b),
        (11, base_b * 0.5),           # cosine 1 with id 10
        (99, np.array([1.0, 0.0, -1.0, 0.5])),  # singleton
    ]
    out = semdedup(
        _emb(spark, rows, dim), eps=0.999, n_centroids=2, dim=dim
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(out) == 6
    # group A resolves to one keeper, group B to one keeper, singleton kept
    ka = {by_id[i].keep_id for i in (1, 2, 3)}
    kb = {by_id[i].keep_id for i in (10, 11)}
    assert len(ka) == 1 and len(kb) == 1 and ka != kb
    assert by_id[99].kept
    # identical cos_c within each group -> tie broken by min vec_id
    assert ka == {1} and kb == {10}
    # exactly one kept per group
    assert sum(by_id[i].kept for i in (1, 2, 3)) == 1
    assert sum(by_id[i].kept for i in (10, 11)) == 1


def test_semdedup_every_vector_assigned_once(spark):
    rng = np.random.RandomState(3)
    rows = [(i, rng.standard_normal(64)) for i in range(40)]
    out = semdedup(_emb(spark, rows, 64), eps=0.99, n_centroids=8).collect()
    assert sorted(r.vec_id for r in out) == list(range(40))
    # with random gaussians at eps=0.99 nothing collides: all kept
    assert all(r.kept for r in out)


def test_semdedup_partitioning_invariance(spark):
    rng = np.random.RandomState(5)
    vs = [rng.standard_normal(64) for _ in range(30)]
    rows = [(i, vs[i % 15]) for i in range(30)]  # 15 exact-dup pairs
    df = _emb(spark, rows, 64)
    a = sorted(map(tuple, semdedup(df, eps=0.95).collect()))
    b = sorted(map(tuple, semdedup(df.repartition(11), eps=0.95).collect()))
    assert a == b
    kept = [t for t in a if t[4]]
    assert len(kept) == 15  # one keeper per exact-dup pair


def test_semdedup_gate_vs_duckdb(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in entry.q_semdedup(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(entry.oracle_sql()["q_semdedup"]).fetchall()
    )
    assert got == want and len(got) > 0
    assert any(not t[4] for t in got), "gate corpus should contain dups"
