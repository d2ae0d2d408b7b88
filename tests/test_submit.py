"""spark-submit --py-files deployment contract (the north-rule launch mode).

Builds the dist zip of `berkeley_entity_spark` (code + packaged ml/
artifacts), copies the job file OUTSIDE the repo, and runs the real
`spark-submit --master local[4] --py-files dist.zip run_pipeline.py` from
that foreign cwd with the repo scrubbed from PYTHONPATH — so the ONLY
import source is the zip, exactly like shipping to a cluster.  Catches
the whole failure class zipimport introduces (e.g. __file__-relative
artifact reads), which in-process tests structurally cannot see."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pyfiles_zip(zpath: str) -> None:
    """Package berkeley_entity_spark (py + artifact files) as a
    --py-files zip, the shape `spark-submit --py-files dist/jobs.zip`
    in jobs/run_pipeline.py's docstring expects."""
    pkg = os.path.join(REPO, "berkeley_entity_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith((".py", ".npy", ".npz", ".json")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


@pytest.mark.slow
def test_spark_submit_pyfiles_runs_pipeline(tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    zpath = str(tmp_path / "jobs.zip")
    build_pyfiles_zip(zpath)
    job = str(tmp_path / "run_pipeline.py")
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            job,
            "--scale",
            "tiny",
            "--checkpoint-dir",
            str(tmp_path / "ckpt"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    stats = json.loads(lines[-1])
    assert stats["mentions"] > 0
    assert stats["clusters"] > 0
    assert stats["cluster_assignments"] >= stats["clusters"]
