#!/usr/bin/env python3
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--er [N]      run the ER pipeline on N synthetic pages (default 60000) and
              print a JSON line with pages/sec (used by --scaling).
--scaling     run the same ER job at local[8] and local[32] in subprocesses,
              compute scaling efficiency = (T8 / T32) / 4, and write
              BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q_lineitem_agg",
    "q_window_top1",
    "q_join_align",
    "q_broadcast_dim",
    "q_token_counts",
    "q_minhash_lsh",
    "q_ngram_jaccard",
    "q_ann_topk",
    "q_sessionize",
    "q_pairwise_f1",
    "q_quality_score",
    "q_er_clusters",
]


def _spark(cpus: int | None = None, shuffle: int | None = None):
    from berkeley_entity_spark.session import get_spark

    master = f"local[{cpus}]" if cpus else None
    s = get_spark(app_name="bes-bench", master=master, shuffle_partitions=shuffle or 32)
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_headline() -> dict:
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spark = _spark()
    qs = entrymod.queries()
    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.monotonic()
        # foreach-noop forces full evaluation without driver collect
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        per_query[name] = dt
        total += dt
    return {
        "metric": "headline_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }


def run_er(n_pages: int, cpus: int | None = None) -> dict:
    import shutil

    from berkeley_entity_spark.config import PipelineConfig, SynthConfig
    from berkeley_entity_spark.plans.checkpoint import CheckpointStore
    from berkeley_entity_spark.plans.pipeline import run_pipeline
    from berkeley_entity_spark.synth import generate_webpages

    spark = _spark(cpus=cpus, shuffle=32)
    root = f"/tmp/bes_bench_ckpt_{cpus or 'auto'}"
    shutil.rmtree(root, ignore_errors=True)
    cfg = SynthConfig(n_pages=n_pages, n_entities=min(1500, max(60, n_pages // 130)))
    # fixed 256-task decomposition at the source (no shuffle) so both
    # parallelism levels run identical work units
    pages, _ = generate_webpages(spark, cfg, num_partitions=256)
    pcfg = PipelineConfig(checkpoint_dir=root)
    t0 = time.monotonic()
    res = run_pipeline(spark, pages, pcfg, store=CheckpointStore(root), resume=False)
    wall = time.monotonic() - t0  # run_pipeline materializes every stage table
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    return {
        "metric": "er_pipeline_pages_per_sec",
        "value": round(n_pages / wall, 2),
        "unit": "pages/sec",
        "wall_sec": round(wall, 2),
        "pages": n_pages,
        "clusters": n_clusters,
        "cpus": cpus,
    }


def run_scaling(n_pages: int) -> dict:
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--er", str(n_pages), "--cpus", str(cpus)],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["wall_sec"], results[32]["wall_sec"]
    eff = (t8 / t32) / 4.0
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "pages": n_pages,
        "local8": results[8],
        "local32": results[32],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured results

## Two-parallelism scaling run (north-rule evidence)

Same ER job (extract -> block -> score -> cluster over {n_pages} synthetic
web pages, identical 64-partition work decomposition, identical input) at two
parallelism levels on this machine:

| parallelism | wall (s) | pages/sec |
|---|---|---|
| local[8]  | {t8} | {results[8]['value']} |
| local[32] | {t32} | {results[32]['value']} |

**Scaling efficiency (T8 / T32) / 4 = {eff:.3f}** (target >= 0.8).

Clusters produced (identical at both levels expected): local[8] ->
{results[8]['clusters']}, local[32] -> {results[32]['clusters']}.

Re-run: `python bench.py --scaling [pages]`.
"""
        )
    return summary


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--er":
        n = int(args[1]) if len(args) > 1 else 60000
        cpus = int(args[args.index("--cpus") + 1]) if "--cpus" in args else None
        print(json.dumps(run_er(n, cpus)))
    elif args and args[0] == "--scaling":
        n = int(args[1]) if len(args) > 1 else 60000
        print(json.dumps(run_scaling(n)))
    else:
        print(json.dumps(run_headline()))


if __name__ == "__main__":
    main()
