"""north_rule launch contract: the whole job runs via
``spark-submit --py-files polyminhash_spark.zip polyminhash_spark/cli.py``
— the package must import from the zip artifact, not from the repo
checkout."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH")


def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import build_zip

    zip_path = build_zip.build(str(tmp_path / "polyminhash_spark.zip"))
    # the driver file is COPIED out of the repo so every
    # `import polyminhash_spark...` must resolve from the zip
    driver = tmp_path / "cli.py"
    shutil.copyfile(os.path.join(REPO, "polyminhash_spark", "cli.py"), driver)

    corpus = tmp_path / "corpus.parquet"
    gen = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from polyminhash_spark.corpus import CorpusParams, write_corpus_parquet; "
         "write_corpus_parquet(%r, CorpusParams(n_files=60, dup_frac=0.3, seed=3))"
         % (REPO, str(corpus))],
        capture_output=True, text=True, timeout=300)
    assert gen.returncode == 0, gen.stderr[-2000:]

    out_dir = tmp_path / "out.parquet"
    wd = tmp_path / "stages"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing may leak the repo onto the path
    run = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(driver),
         "run", "--input", str(corpus), "--out", str(out_dir),
         "--workdir", str(wd), "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env)
    assert run.returncode == 0, run.stderr[-3000:]
    metrics = json.loads(
        [l for l in run.stdout.splitlines() if l.startswith("{")][-1])
    assert metrics["n_records"] == 60
    assert metrics["n_dup_pairs"] >= 1
    # stage checkpoints + manifests + metrics table landed in the workdir
    assert (wd / "clusters_polyminhash_manifest.json").exists()
    assert (wd / "_metrics").is_dir()
    assert os.path.isdir(out_dir)
