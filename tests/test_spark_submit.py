"""Real `spark-submit --py-files` smoke: the north rule requires jobs to
run via spark-submit with the engine shipped as a --py-files archive.

The job script is copied OUT of the repo so its sys.path bootstrap
points at a directory without openmldb_spark — the package can only
come from the zip, exactly as on a cluster where executors unpack the
archive. A second submit against the same checkpoint dir must resume
every stage (fingerprint match, jobs/runner.py).

Runs a JVM-spawning subprocess (~40 s each); skipped unless spark-submit
is present.
"""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit binary not available")
def test_spark_submit_pyfiles_and_resume(tmp_path):
    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "openmldb_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    # isolate the job script from the repo: its sys.path bootstrap must
    # NOT be able to find openmldb_spark on local disk
    iso = tmp_path / "iso" / "jobs"
    iso.mkdir(parents=True)
    shutil.copy(os.path.join(REPO, "jobs", "backfill.py"), iso)
    ckpt = tmp_path / "ckpt"

    def submit():
        out = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[8]",
             "--py-files", str(zip_path), "jobs/backfill.py",
             "--sf-dir", "/root/testdata/sf0.001",
             "--ckpt-dir", str(ckpt)],
            cwd=str(iso.parent), capture_output=True, text=True,
            timeout=420)
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    first = submit()
    assert first["rows"] == 1000
    assert all(s["action"] == "computed" for s in first["ledger"])

    second = submit()
    assert second["rows"] == first["rows"]
    assert all(s["action"] == "resumed" for s in second["ledger"])
    assert [s["fingerprint"] for s in second["ledger"]] == \
        [s["fingerprint"] for s in first["ledger"]]
