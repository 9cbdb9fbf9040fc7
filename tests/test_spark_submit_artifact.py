"""North-rule evidence: the pipeline ships as a literal ``spark-submit
--py-files`` invocation. A subprocess spark-submit runs the CLI from a
scratch directory with NO repo on PYTHONPATH — the only way the driver
and the executors can import fscrawler_spark (and unpickle the UDF
closures) is through the zip built by artifact.build_pyfiles_zip. This
is the same contract get_spark()'s addPyFile auto-ship satisfies
in-process; here the artifact is proven on the real submit path.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest


def _spark_submit_bin():
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


DRIVER = """\
import sys
from fscrawler_spark.cli import main
sys.exit(main(sys.argv[1:]))
"""


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    submit = _spark_submit_bin()
    if submit is None:
        pytest.skip("spark-submit not on PATH and not in the pyspark install")

    from fscrawler_spark.artifact import build_pyfiles_zip
    from fscrawler_spark.datagen import generate_transcripts

    paths = generate_transcripts(str(tmp_path / "data"), n_turns=300, seed=11)
    zip_path = build_pyfiles_zip(str(tmp_path / "fscrawler_spark.zip"))
    driver_py = tmp_path / "driver.py"
    driver_py.write_text(DRIVER)
    out = str(tmp_path / "out")

    # Scrub the inherited environment of every path to the repo: the
    # subprocess must resolve the package from --py-files alone.
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            str(driver_py),
            "--input", paths["transcripts"],
            "--output", out,
            "--num-buckets", "4",
            "--master", "local[4]",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["status"] == "completed"
    assert sorted(stats["written_buckets"]) == [0, 1, 2, 3]

    docs = spark.read.parquet(os.path.join(out, "docs"))
    assert docs.count() == 300
    # the extraction UDFs ran on executors that imported from the zip:
    # extracted text is present for parseable rows
    assert docs.filter("extracted is not null").count() > 0
