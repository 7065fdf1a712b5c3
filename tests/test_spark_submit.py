"""The north-rule launch path: spark-submit --py-files engine.zip runs
the resumable featurization job end-to-end (fresh JVM, engine imported
from the zip, buckets + manifests + snapshot written)."""

from __future__ import annotations

import json
import subprocess
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_spark_submit_py_files_job(spark, tmp_path):
    from gfwspark import tables

    img_path = str(tmp_path / "img.parquet")
    ann_path = str(tmp_path / "ann.parquet")
    out_path = str(tmp_path / "out")
    tables.synthesize_image_caption(spark, n_entities=8, rows_per_entity=6).drop(
        "bytes"
    ).write.mode("overwrite").parquet(img_path)
    (
        tables.synthesize_annotations(spark, n_entities=8)
        .groupBy("image_id", "start_ts")
        .agg({"value": "max"})
        .withColumnRenamed("max(value)", "label")
        .write.mode("overwrite")
        .parquet(ann_path)
    )

    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in (REPO / "gfwspark").rglob("*.py"):
            zf.write(p, p.relative_to(REPO))

    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", str(zip_path),
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=4g",
            str(REPO / "jobs" / "featurize_job.py"),
            "--input", img_path, "--annotations", ann_path,
            "--output", out_path, "--buckets", "2",
            "--large-windows", "4,16",
        ],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    manifests = sorted((Path(out_path) / "_manifests").glob("bucket_*.json"))
    assert len(manifests) == 2
    snap = json.loads((Path(out_path) / "_manifests" / "snapshots.json").read_text())
    assert snap[-1]["total_rows"] > 0

    from gfwspark import checkpoint

    result = checkpoint.read_result(spark, out_path)
    assert result.count() == snap[-1]["total_rows"]
    assert "asof_label" in result.columns


def test_spark_submit_corpus_prep_job(spark, tmp_path):
    """The corpus-prep pipeline launches via spark-submit --py-files in
    a fresh JVM and writes a split-partitioned packed manifest plus a
    JSON audit summary."""
    docs_path = str(tmp_path / "docs.parquet")
    bench_path = str(tmp_path / "bench.parquet")
    out_path = str(tmp_path / "corpus")

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(
        docs_path
    )
    import pyspark.sql.functions as F

    from gfwspark import text

    spark.read.parquet(docs_path).filter(F.col("doc_id") % 50 == 0).select(
        F.concat_ws(" ", F.slice(text.tokens_col("text"), 11, 30)).alias("text")
    ).write.parquet(bench_path)

    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in (REPO / "gfwspark").rglob("*.py"):
            zf.write(p, p.relative_to(REPO))

    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", str(zip_path),
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=4g",
            str(REPO / "jobs" / "corpus_prep_job.py"),
            "--input", docs_path, "--benchmark", bench_path,
            "--output", out_path,
        ],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["docs_out"] > 0
    assert set(summary["splits"]) == {"train", "val"}
    assert summary["docs_out"] < summary["docs_in"]  # gates dropped rows

    back = spark.read.parquet(out_path)
    assert back.filter(F.col("split") == "train").count() == summary["splits"]["train"]


def test_spark_submit_blocks_maintain_job(spark, tmp_path):
    """Fresh-JVM build + append of the at-rest stride-blocks layout via
    spark-submit --py-files: after both runs the maintained table must
    equal stride_blocks over the full input."""
    from datetime import datetime

    from gfwspark import windows

    def t(m):
        return datetime(2024, 1, 1, 0, m)

    schema = "image_id string, ts timestamp, v double"
    base = spark.createDataFrame(
        [("e1", t(0), 1.0), ("e1", t(1), 2.0), ("e1", t(2), 3.0),
         ("e2", t(0), 9.0)],
        schema,
    )
    appd = spark.createDataFrame(
        [("e1", t(3), 4.0), ("e2", t(5), 8.0), ("e3", t(0), 7.0)], schema
    )
    base_p, app_p = str(tmp_path / "base.pq"), str(tmp_path / "app.pq")
    blocks_p = str(tmp_path / "blocks")
    base.write.parquet(base_p)
    appd.write.parquet(app_p)

    zip_path = tmp_path / "engine.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in (REPO / "gfwspark").rglob("*.py"):
            zf.write(p, p.relative_to(REPO))

    def run(mode, inp):
        proc = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--py-files", str(zip_path),
                "--conf", "spark.sql.session.timeZone=UTC",
                "--conf", "spark.ui.enabled=false",
                str(REPO / "jobs" / "blocks_maintain_job.py"),
                "--mode", mode, "--input", inp, "--blocks", blocks_p,
                "--feature-col", "v", "--shift", "2", "--buckets", "2",
                "--on-late", "drop",
            ],
            capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]

    run("build", base_p)
    run("append", app_p)

    want = (
        windows.stride_blocks(base.unionByName(appd), "v", shift=2)
        .toPandas().sort_values(["image_id", "block_id"]).reset_index(drop=True)
    )
    got = (
        spark.read.parquet(blocks_p).drop("_bucket").toPandas()
        .sort_values(["image_id", "block_id"]).reset_index(drop=True)
    )
    assert want[["image_id", "block_id"]].equals(got[["image_id", "block_id"]])
    for (_, ra), (_, rb) in zip(want.iterrows(), got.iterrows()):
        assert list(ra["values"]) == list(rb["values"])
        assert list(ra.ts_arr) == list(rb.ts_arr)  # merge order: old prefix first
