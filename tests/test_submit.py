"""End-to-end spark-submit --py-files evidence (north rule deployment
clause): build dist/uncharted_ta1_spark.zip, copy the entrypoint script
OUTSIDE the repo, strip PYTHONPATH, and run a real `spark-submit
--py-files` backfill — the package must resolve from the shipped zip, not
from the working tree."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_backfill(tmp_path):
    import pyspark

    zip_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_out.endswith(".zip") and os.path.exists(zip_out)

    # run from OUTSIDE the repo so `import uncharted_ta1_spark` can only be
    # satisfied by the --py-files zip (the script's own sys.path insert
    # points at tmp's parent, which has no package)
    script = str(tmp_path / "submit_backfill.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_backfill.py"), script)
    out_dir = str(tmp_path / "bf_out")

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_out,
            script,
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out_dir,
            "--buckets", "4",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    # the backfill produced committed bucket data + a checkpoint log
    data = os.path.join(out_dir, "data")
    ckpt = os.path.join(out_dir, "_checkpoint")
    assert os.path.isdir(data) and os.path.isdir(ckpt)
    buckets = [d for d in os.listdir(data) if d.startswith("bucket=")]
    assert len(buckets) == 4
