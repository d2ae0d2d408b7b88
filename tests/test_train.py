"""AdaGrad-L1 trainer tests (reference semantics M3-M5)."""

import numpy as np

from berkeley_entity_spark.ml.train import adagrad_l1_train


def test_learns_separable_data():
    rng = np.random.RandomState(0)
    n, d = 2000, 6
    X = rng.standard_normal((n, d))
    X[:, -1] = 1.0  # bias
    true_w = np.array([3.0, -2.0, 1.5, 0.0, 0.0, 0.2])
    y = ((X @ true_w) > 0).astype(float)
    w = adagrad_l1_train(X, y, epochs=10)
    acc = (((X @ w) > 0) == (y == 1)).mean()
    assert acc >= 0.97, acc


def test_l1_sparsifies_noise_features():
    rng = np.random.RandomState(1)
    n = 3000
    signal = rng.standard_normal((n, 2))
    noise = rng.standard_normal((n, 4)) * 0.01
    X = np.hstack([signal, noise, np.ones((n, 1))])
    y = ((signal @ np.array([2.0, -2.0])) > 0).astype(float)
    w = adagrad_l1_train(X, y, lambda_reg=0.01, epochs=10)
    assert np.abs(w[:2]).min() > 10 * np.abs(w[2:6]).max()


def test_deterministic():
    rng = np.random.RandomState(2)
    X = rng.standard_normal((500, 4))
    y = (rng.rand(500) > 0.5).astype(float)
    assert np.array_equal(adagrad_l1_train(X, y), adagrad_l1_train(X, y))


def test_asymmetric_loss_favors_recall():
    """With 3x false-negative cost (reference customLoss 0.1/3/1 semantics)
    the decision boundary shifts toward predicting positive."""
    rng = np.random.RandomState(3)
    n = 4000
    x = rng.standard_normal((n, 1))
    X = np.hstack([x, np.ones((n, 1))])
    y = (x[:, 0] + rng.standard_normal(n) * 0.8 > 0).astype(float)
    w_sym = adagrad_l1_train(X, y, false_neg_weight=1.0, epochs=5)
    w_asym = adagrad_l1_train(X, y, false_neg_weight=3.0, epochs=5)
    rec_sym = (((X @ w_sym) > 0) & (y == 1)).sum() / (y == 1).sum()
    rec_asym = (((X @ w_asym) > 0) & (y == 1)).sum() / (y == 1).sum()
    assert rec_asym >= rec_sym


def test_weights_roundtrip_through_pipeline(spark, tmp_path):
    """S8 model serialization: trained weights -> .npy -> pipeline run.

    The reference gzip-serializes its PairwiseScorer (GUtil.save/load,
    EntitySystem.scala:181); our model artifact is the weight vector, saved
    with numpy and fed to run_pipeline(weights=...) / the CLI --weights flag.
    """
    import numpy as np

    from berkeley_entity_spark.config import PipelineConfig, SynthConfig
    from berkeley_entity_spark.operators.scoring import weights_vector
    from berkeley_entity_spark.plans.checkpoint import CheckpointStore
    from berkeley_entity_spark.plans.pipeline import run_pipeline
    from berkeley_entity_spark.synth import generate_webpages

    w = weights_vector({"jaro_winkler": 3.5})  # a "trained" perturbation
    path = tmp_path / "weights.npy"
    np.save(path, w)
    loaded = np.load(path)
    assert np.array_equal(w, loaded)

    pages, _ = generate_webpages(spark, SynthConfig(n_pages=150, n_entities=25))
    root = str(tmp_path / "ckpt")
    res = run_pipeline(
        spark, pages, PipelineConfig(checkpoint_dir=root),
        weights=loaded, store=CheckpointStore(root), resume=False,
    )
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    assert n_clusters >= 25  # all entities resolved into clusters


def test_kfold_prune_models(spark, tiny_corpus):
    """M10 (CorefPruner.scala:100-153): per-fold models trained on the
    complement; fold-aware scoring keeps >=99% of gold-positive pairs above
    threshold (the pruner's contract) and each fold's scores come from ITS
    model."""
    import numpy as np
    from pyspark.sql import functions as F

    from berkeley_entity_spark.ml.train import kfold_prune_models, score_with_fold_models
    from berkeley_entity_spark.operators.blocking import distinct_surfaces
    from berkeley_entity_spark.operators.scoring import collect_idf, idf_table
    from berkeley_entity_spark.synth import gold_pair_table

    _, pages, gold = tiny_corpus
    from berkeley_entity_spark.operators.extract import extract_mentions

    mentions = extract_mentions(pages.where("lang = 'en'")).localCheckpoint(eager=True)
    gp = gold_pair_table(gold.where("lang = 'en'")).cache()
    k = 3
    weights = kfold_prune_models(spark, mentions, gp, k=k)
    assert len(weights) == k
    # folds see different data -> models differ
    assert not np.allclose(weights[0], weights[1])

    # build the labeled surface pairs the same way and score fold-aware
    m = mentions.select("mention_id", "norm_name")
    surfaces = distinct_surfaces(mentions).persist()
    sn = surfaces.select("norm_name", "node_id", "is_acr")
    labeled = (
        gp.join(m.toDF("mention_a", "norm_a"), "mention_a")
        .join(m.toDF("mention_b", "norm_b"), "mention_b")
        .join(sn.toDF("norm_a", "node_a", "acr_a"), "norm_a")
        .join(sn.toDF("norm_b", "node_b", "acr_b"), "norm_b")
        .where(F.col("norm_a") != F.col("norm_b"))
        .select("norm_a", "norm_b", "acr_a", "acr_b", "label")
        .distinct()
    )
    idf = collect_idf(idf_table(surfaces))
    scored = score_with_fold_models(labeled, idf, weights).cache()
    # pruning recall on positives
    pos = scored.where("label")
    kept = pos.where("score > 0").count()
    total = pos.count()
    assert total > 0 and kept / total >= 0.99, (kept, total)
    # spot-check: a fold-f row's score equals X @ w_f exactly
    from berkeley_entity_spark.operators.features import featurize_pair

    rows = scored.limit(20).collect()
    for r in rows:
        import pyspark.sql.functions as _F  # noqa: F401
        f = int(spark.createDataFrame([(r["norm_a"],)], "x string")
                .select(F.pmod(F.xxhash64("x"), F.lit(k)).cast("int")).collect()[0][0])
        x = np.array(featurize_pair(r["norm_a"], r["norm_b"], idf, r["acr_a"], r["acr_b"]))
        assert abs(float(x @ weights[f]) - r["score"]) < 1e-9


def test_calibrate_bias_tie_run():
    """Code-review regression: when the F-beta optimum lands in a tie run,
    the threshold must sit strictly BELOW the tied score so score>0 keeps
    every tied pair the optimum counted."""
    import numpy as np

    from berkeley_entity_spark.ml.train import calibrate_bias

    # identical feature rows -> identical scores (a tie run of positives)
    X = np.array([[1.0, 1.0]] * 4 + [[0.0, 1.0]] * 4)
    y = np.array([1.0] * 4 + [0.0] * 4)
    w = np.array([5.0, 0.0])  # scores: 5,5,5,5,0,0,0,0
    w2 = calibrate_bias(w, X, y)
    s = X @ w2
    kept = (s > 0).sum()
    assert kept == 4, s  # ALL four tied positives survive score>0
    # empty sample: no crash, weights unchanged
    w3 = calibrate_bias(w, np.zeros((0, 2)), np.zeros(0))
    assert np.allclose(w3, w)
