"""North-rule contract: the pipeline runs via `spark-submit --py-files`
(cli.py) as a real subprocess — package zipped, no repo on the driver's
sys.path, fresh JVM.  This is the deployment shape for a real cluster;
everything else in the suite runs in-process."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(tmp: Path) -> Path:
    zpath = tmp / "pagerank_cuda_dynamic_spark.zip"
    pkg = REPO / "pagerank_cuda_dynamic_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


@pytest.mark.skipif(
    not Path(SPARK_SUBMIT).exists(), reason="spark-submit binary unavailable"
)
def test_spark_submit_py_files_dfp(tmp_path):
    zpath = _zip_package(tmp_path)
    out = tmp_path / "ranks_out"
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(REPO / "pagerank_cuda_dynamic_spark" / "cli.py"),
            "--synthesize", "120",
            "--technique", "dfp",
            "--batches", "2",
            "--out", str(out),
            "--checkpoint-dir", str(ckpt),
        ],
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # final stdout line is the run summary JSON
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["out"] == str(out)

    # result sanity: (entity, rank) parquet, ranks sum to 1
    import pandas as pd

    files = list(out.glob("*.parquet"))
    assert files, "no parquet output written"
    pdf = pd.concat([pd.read_parquet(f) for f in files])
    assert set(pdf.columns) >= {"entity", "rank"}
    assert len(pdf) > 0
    assert abs(pdf["rank"].sum() - 1.0) < 1e-6

    # checkpoints were written per batch with metrics (lineage contract)
    metrics = list(Path(ckpt).rglob("metrics.json"))
    assert metrics, "no checkpoint metrics written"
