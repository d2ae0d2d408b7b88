#!/usr/bin/env python3
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--er [N]      run the ER pipeline on N synthetic pages (default 60000) and
              print a JSON line with pages/sec (used by --scaling).
--scaling     run the same ER job at local[4] and local[16] in subprocesses
              (physical-core pair — the box's 32 vCPUs are SMT-paired, so
              8/32 measures hyperthread contention, not scaling), compute
              scaling efficiency = (T4 / T16) / 4, and write
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
    # q_er_pipeline is round-2's "q_er_clusters" renamed (same computation:
    # full trained-model synth pipeline) — compare r3's q_er_pipeline time
    # against r2's q_er_clusters.  The NEW q_er_clusters is the SQL-oracled
    # documents-corpus spine added in round 3.
    "q_er_pipeline",
    "q_er_clusters",
    # new in round 4 (subtract it when comparing headline totals to r3)
    "q_substring_dup",
    "q_segment_dedup",
    # new in round 4, fifth session (subtract when comparing to earlier r4)
    "q_quality_classifier",
    "q_bpe_merges",
    "q_meta_blocking",
    # new in round 4, fourth session (subtract when comparing to earlier
    # r4 runs).  q_bloom_decontaminate and q_domain_mix stay out: the
    # former is hashlib-bound BY DESIGN (md5 keeps it oracle-exact; a
    # production run swaps xxhash), the latter is a trivial bounded agg —
    # both are gate-verified at sf0.01 instead.
    "q_asof_join",
    "q_dsir_select",
    "q_semdedup",
    "q_pack_sequences",
    "q_fs_em",
    # new in round 5 (subtract when comparing headline totals to r4):
    # trained sentence splitter, wiki XML dump parse, query chooser,
    # and the now-self-sized LSH ANN (was pinned n_planes=4 through r4)
    "q_sent_split",
    "q_wiki_dump",
    "q_query_chooser",
    "q_ann_lsh",
]


def _spark(cpus: int | None = None, shuffle: int | None = None):
    from berkeley_entity_spark.session import get_spark

    master = f"local[{cpus}]" if cpus else None
    s = get_spark(
        app_name="bes-bench",
        master=master,
        shuffle_partitions=shuffle or 32,
        # keep stdout clean for the driver's JSON-line parse (round-4
        # lesson: BENCH_r04.json came back parsed:null)
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _spin_calibration() -> float:
    """Single-process pure-CPU spin wall (seconds) — ~1.1s on this box's
    nominal windows, 2x+ when the host is degraded.  Recorded around the
    headline loop so a reader can normalize cross-round walls: per-query
    ratios against this number separate host drift from code change
    (round-2 lesson: a 'regression' window showed every untouched TPC-H
    query uniformly 2.5x slower with calibration 2.1s vs 1.1 nominal)."""
    out = subprocess.run(
        [sys.executable, "-c", _SPIN], capture_output=True, text=True
    )
    return round(float(out.stdout.strip()), 3)


def _group_job_stats(sc, group: str, before: set | None = None) -> tuple[int, int]:
    """(jobs, stages) run under a job group since `before` (a prior job-id
    snapshot).  The status store is fed by the ASYNC listener bus, so give
    it a short drain window before reading — without it a job whose start
    event is still queued is silently missed and the 'noise-free' metric
    itself becomes noisy."""
    time.sleep(0.3)
    tracker = sc.statusTracker()
    ids = set(tracker.getJobIdsForGroup(group) or []) - (before or set())
    stages = 0
    for j in ids:
        info = tracker.getJobInfo(j)
        stages += len(info.stageIds) if info else 0
    return len(ids), stages


def run_headline() -> dict:
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spin_before = _spin_calibration()
    spark = _spark()
    qs = entrymod.queries()
    # untimed warm-up: codegen/JIT + python worker pool + parquet footer reads,
    # so per-query numbers are steady-state (the first query otherwise absorbs
    # several seconds of one-time session cost).  Uses only NON-headline work
    # (q_top_tokens + a throwaway pandas kernel) so no timed query gets an
    # unfair second-run advantage.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs["q_top_tokens"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(1000).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    per_query: dict[str, float] = {}
    jobs_stages: dict[str, list[int]] = {}
    sc = spark.sparkContext
    total = 0.0
    for name in HEADLINE:
        sc.setJobGroup(name, name)
        before = set(sc.statusTracker().getJobIdsForGroup(name) or [])
        t0 = time.monotonic()
        # foreach-noop forces full evaluation without driver collect
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.monotonic() - t0, 3)
        per_query[name] = dt
        total += dt
        # job/stage counts: the NOISE-FREE per-query metric — walls on this
        # host drift up to 3x between windows, scheduling structure doesn't
        jobs_stages[name] = list(_group_job_stats(sc, name, before))
    sc.setJobGroup("min2", "min2")
    # second timed pass: auxiliary min-of-2 per query.  The headline
    # `value` stays the FIRST pass (the metric r1/r2 recorded); the min
    # pass exists because this host's wall drifts up to 3x between
    # windows — min-of-2 plus the spin calibrations lets a reader tell
    # host drift from code change without re-running.
    per_query_min: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        per_query_min[name] = min(per_query[name], round(time.monotonic() - t0, 3))
    spin_after = _spin_calibration()
    # calibration-normalized walls: divide by (measured spin / nominal 1.1)
    # so cross-round comparisons separate host drift from code change
    # without the reader doing the arithmetic (round-4 task); nominal 1.1s
    # is this box's uncontended spin wall (BENCH/BASELINE.md)
    spin_mean = (spin_before + spin_after) / 2.0
    norm = 1.1 / spin_mean if spin_mean > 0 else 1.0
    out = {
        "metric": "headline_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "queries_min2": per_query_min,
        "total_min2": round(sum(per_query_min.values()), 3),
        "queries_min2_normalized": {
            k: round(v * norm, 3) for k, v in per_query_min.items()
        },
        "total_min2_normalized": round(sum(per_query_min.values()) * norm, 3),
        "jobs_stages": jobs_stages,
        "spin_calibration_sec": [spin_before, spin_after],
        "sf": sf,
    }
    # attach the committed sf1.0 soak evidence (tools/soak_sf1.py: the same
    # headline queries on a key-consistent 10x replica, with job/stage
    # counts) so BENCH_r{N}.json carries the at-scale numbers
    for tag in ("sf1", "sf3"):
        soak_path = os.path.join(REPO, "BENCH", f"soak_{tag}.json")
        if os.path.exists(soak_path):
            with open(soak_path) as f:
                out[f"{tag}_soak"] = json.load(f)
    return out


def run_er(n_pages: int, cpus: int | None = None, warmup: bool = True) -> dict:
    import shutil

    from berkeley_entity_spark.config import PipelineConfig, SynthConfig
    from berkeley_entity_spark.plans.checkpoint import CheckpointStore
    from berkeley_entity_spark.plans.pipeline import run_pipeline
    from berkeley_entity_spark.synth import generate_webpages

    spark = _spark(cpus=cpus, shuffle=32)
    root = f"/tmp/bes_bench_ckpt_{cpus or 'auto'}"
    cfg = SynthConfig(n_pages=n_pages, n_entities=min(1500, max(60, n_pages // 130)))
    # fixed 256-task decomposition at the source (no shuffle) so both
    # parallelism levels run identical work units
    pages, _ = generate_webpages(spark, cfg, num_partitions=256)
    pcfg = PipelineConfig(checkpoint_dir=root)
    if warmup:
        # full pipeline at 1/10 scale first: JIT/codegen caches + python
        # worker pool spin-up, so the timed region is steady-state throughput
        wcfg = SynthConfig(n_pages=max(2000, n_pages // 10), n_entities=200)
        wpages, _ = generate_webpages(spark, wcfg, num_partitions=64)
        shutil.rmtree(root + "_warm", ignore_errors=True)
        run_pipeline(
            spark, wpages, PipelineConfig(checkpoint_dir=root + "_warm"),
            store=CheckpointStore(root + "_warm"), resume=False,
        )
    shutil.rmtree(root, ignore_errors=True)
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


_SPIN = (
    "import time\nt0=time.monotonic()\nx=0\n"
    "for i in range(20_000_000): x+=i\n"
    "print(time.monotonic()-t0)\n"
)


def _cpu_ceiling(lo: int, hi: int) -> float:
    """The host's own parallel-scaling ceiling: throughput ratio of `hi` vs
    `lo` concurrent pure-CPU python processes, normalized by hi/lo.  On this
    sandbox's oversubscribed VM this fluctuates (measured 0.75-0.95) — the
    pipeline cannot scale better than the CPUs do, so the ceiling contextualizes
    the pipeline efficiency number."""

    def tput(n: int) -> float:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _SPIN], stdout=subprocess.PIPE, text=True
            )
            for _ in range(n)
        ]
        walls = [float(p.communicate()[0].strip()) for p in procs]
        return n / (sum(walls) / len(walls))

    return (tput(hi) / tput(lo)) / (hi / lo)


def run_scaling(n_pages: int, cpus_pair: tuple[int, int] = (4, 16), reps: int = 3) -> dict:
    """North-rule scaling evidence: same job, same input, N vs 4N cores.

    Protocol (this sandbox VM has high timing variance and SMT-paired vCPUs):
      * local[N] vs local[4N] with N=4 by default — 4 and 16 worker threads
        both fit on distinct physical cores; 8->32 would span the SMT
        boundary and measure hyperthreading, not the pipeline.
      * each measured run is preceded by a 1/10-scale warm-up of the full
        pipeline in the same JVM (JIT, codegen, python worker pools).
      * `reps` interleaved repetitions per level; the MINIMUM wall time per
        level estimates uncontended cost (standard practice on noisy hosts).
    """
    lo, hi = cpus_pair
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    ceilings: list[float] = [round(_cpu_ceiling(lo, hi), 3)]
    for _ in range(reps):
        for cpus in (lo, hi):
            out = subprocess.run(
                [sys.executable, __file__, "--er", str(n_pages), "--cpus", str(cpus)],
                capture_output=True,
                text=True,
                check=True,
                cwd=REPO,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            runs[cpus].append(json.loads(line))
        ceilings.append(round(_cpu_ceiling(lo, hi), 3))
    best = {c: min(rs, key=lambda r: r["wall_sec"]) for c, rs in runs.items()}
    t_lo, t_hi = best[lo]["wall_sec"], best[hi]["wall_sec"]
    eff = (t_lo / t_hi) / (hi / lo)
    ceiling = max(ceilings)
    summary = {
        "metric": f"scaling_efficiency_{lo}_to_{hi}",
        "value": round(eff, 3),
        "unit": "ratio",
        "pages": n_pages,
        f"local{lo}": best[lo],
        f"local{hi}": best[hi],
        "all_walls": {c: [r["wall_sec"] for r in rs] for c, rs in runs.items()},
        "cpu_ceiling": ceiling,
        "cpu_ceilings": ceilings,
        "efficiency_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # per-run file: BENCH/BASELINE.md is CURATED (multi-run disclosure) and
    # must not be clobbered by each invocation
    with open(os.path.join(REPO, "BENCH", f"scaling_{n_pages}_{lo}_{hi}.md"), "w") as f:
        f.write(
            f"""# BENCH scaling run — {n_pages} pages, local[{lo}] vs local[{hi}]

## Two-parallelism scaling run (north-rule evidence)

Same ER job (extract -> block -> score -> cluster over {n_pages} synthetic
web pages, identical 256-partition work decomposition, identical input) at
two parallelism levels on this machine — the in-sandbox stand-in for N vs 4N
executors.  Protocol: full-pipeline warm-up in the same JVM before each
timed run; {reps} interleaved repetitions per level; minimum wall per level
(this VM shows double-digit-percent timing noise; raw CPU scaling measured
at {lo}->{hi} busy processes on it is ~0.94, the attainable ceiling).
local[{lo}] and local[{hi}] are used rather than 8/32 because the box's 32
vCPUs are SMT-paired: beyond 16 threads a "core" is a hyperthread sibling,
which caps even embarrassingly parallel spin loops at ~0.55 efficiency.

| parallelism | wall (s), min of {reps} | pages/sec | all walls (s) |
|---|---|---|---|
| local[{lo}]  | {t_lo} | {best[lo]['value']} | {summary['all_walls'][lo]} |
| local[{hi}] | {t_hi} | {best[hi]['value']} | {summary['all_walls'][hi]} |

**Scaling efficiency (T{lo} / T{hi}) / {hi // lo} = {eff:.3f}** (target >= 0.8).

Host CPU ceiling measured around the runs (pure-CPU spin processes at the
same {lo}->{hi} parallelism, best of {len(ceilings)} samples): **{ceiling:.3f}** —
the pipeline cannot scale better than the host's CPUs do.  Pipeline
efficiency relative to that attainable ceiling: **{eff / ceiling:.3f}**.
All ceiling samples: {ceilings} (the spread is the host's multi-tenant
noise, visible identically in the raw pipeline walls).

Clusters produced (identical at both levels expected): local[{lo}] ->
{best[lo]['clusters']}, local[{hi}] -> {best[hi]['clusters']}.

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
        n = int(args[1]) if len(args) > 1 and not args[1].startswith("--") else 600000
        reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 3
        if "--cpus" in args:
            lo, hi = (int(x) for x in args[args.index("--cpus") + 1].split(","))
        else:
            lo, hi = 4, 16
        print(json.dumps(run_scaling(n, (lo, hi), reps)))
    else:
        # Driver contract: ONE short JSON line on stdout, nothing else.
        # Round-4 lesson: the driver keeps only a tail window of stdout, so
        # the old multi-KB line (jobs_stages + min2 + embedded soak) got its
        # head truncated -> BENCH_r04.json parsed:null.  Fix twice over:
        # (1) dup stdout away so any stray JVM/py write lands on stderr and
        # only the final JSON goes to the real fd 1; (2) print a COMPACT
        # line (metric/value/unit/queries/sf) and file the full detail
        # under BENCH/headline_full.json.
        real_stdout = os.dup(1)
        os.dup2(2, 1)
        try:
            full = run_headline()
        finally:
            os.dup2(real_stdout, 1)
            os.close(real_stdout)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "headline_full.json"), "w") as f:
            json.dump(full, f, indent=1)
        compact = {
            "metric": full["metric"],
            "value": full["value"],
            "unit": full["unit"],
            "queries": full["queries"],
            "sf": full["sf"],
            "total_min2": full["total_min2"],
            "total_min2_normalized": full["total_min2_normalized"],
            "spin_calibration_sec": full["spin_calibration_sec"],
        }
        sys.stdout.write(json.dumps(compact) + "\n")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
