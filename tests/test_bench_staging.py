"""bench.ensure_split_sf_dir stages the sf tables into many-file copies
(a parquet row group is the unit of scan parallelism, so the driver's
single-row-group files would serialize map-heavy queries); the staged
copy must be layout-only — identical rows, identical schema."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

SF_DIR = "/root/testdata/sf0.001"


def test_staged_tables_identical_rows(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TMP", str(tmp_path))
    staged = bench.ensure_split_sf_dir(spark, SF_DIR, parts=4)
    assert os.path.exists(os.path.join(staged, "_STAGED"))
    for t in ("lineitem", "documents", "embeddings"):
        a = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        b = spark.read.parquet(f"{staged}/{t}.parquet")
        assert a.schema == b.schema, t
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), t
        # really many files, not one
        assert len(os.listdir(f"{staged}/{t}.parquet")) > 2, t


def test_staging_is_idempotent(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_TMP", str(tmp_path))
    p1 = bench.ensure_split_sf_dir(spark, SF_DIR, parts=4)
    mtime = os.path.getmtime(os.path.join(p1, "lineitem.parquet"))
    p2 = bench.ensure_split_sf_dir(spark, SF_DIR, parts=4)
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p1, "lineitem.parquet")) == mtime
