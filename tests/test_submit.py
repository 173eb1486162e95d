"""Deployment-shape test: the engine runs under REAL spark-submit with
the package shipped via --py-files (the north-rule run mode), and the
resulting table state is byte-identical to an in-process replay of the
same input."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(tmp: str) -> str:
    zpath = os.path.join(tmp, "filters_spark.zip")
    pkg = os.path.join(REPO, "filters_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_matches_in_process(spark, tmp_path):
    zpath = _zip_package(str(tmp_path))
    # copy the entry script OUT of the repo so `import filters_spark`
    # can only resolve from the --py-files archive, as on a cluster
    script = str(tmp_path / "submit_replay.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_replay.py"), script)
    lake_sub = str(tmp_path / "lake_submit")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath, script,
            "--lake-root", lake_sub, "--n-events", "2000",
            "--num-buckets", "4", "--batches", "2",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["applied"] > 0 and metrics["final_rows"] > 0

    # in-process replay of the SAME synthesized input -> same state
    from filters_spark.engine.cdc import CDCEngine
    from filters_spark.engine.defaults import default_registry
    from filters_spark.lake.table import LakeTable
    from filters_spark.sources.datagen import gen_events

    t2 = LakeTable.create(spark, str(tmp_path / "lake_ref"), ["repo", "path"], num_buckets=4)
    eng = CDCEngine(spark, t2, default_registry())
    eng.replay(
        gen_events(spark, n_events=2000, n_repos=20, n_paths=200,
                   hot_frac=0.2, dirty_frac=0.1, seed=7),
        num_batches=2,
    )
    ref = {(r.repo, r.path, r.content_sha) for r in t2.read().collect()}
    # read the submitted job's table from THIS session
    sub = {
        (r.repo, r.path, r.content_sha)
        for r in LakeTable.load(spark, lake_sub).read().collect()
    }
    assert sub == ref
    assert len(sub) == metrics["final_rows"]
