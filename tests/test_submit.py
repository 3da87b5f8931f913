"""North-rule packaging contract: the engine runs via spark-submit
--py-files <zip> with the repo NOT on the driver's path — proving the
zip alone carries the package to driver and executors."""

import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    import pyspark

    zpath = tmp_path / "extractors_geo_spark.zip"
    pkg = os.path.join(REPO, "extractors_geo_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(
        "from pyspark.sql import SparkSession\n"
        "from extractors_geo_spark import datagen\n"
        "from extractors_geo_spark.operators import extract_meta, pip_join\n"
        "spark = (SparkSession.builder.master('local[4]')\n"
        "         .config('spark.sql.shuffle.partitions', '8').getOrCreate())\n"
        "imgs = datagen.images_df(spark, 200, partitions=4)\n"
        "meta = extract_meta.valid_meta(extract_meta.extract_meta(imgs, with_stats=False))\n"
        "polys = datagen.polygons_df(spark)\n"
        "n = pip_join.pip_join(meta, polys).count()\n"
        "print('SUBMIT_ROWS', n)\n"
    )
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    # cwd OUTSIDE the repo: only the zip can provide the package
    r = subprocess.run(
        [submit, "--py-files", str(zpath), str(driver)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("SUBMIT_ROWS")]
    assert line, r.stdout[-2000:]
    n = int(line[0].split()[1])
    assert n > 100  # ~90% of 200 images are valid geo and land in a polygon
