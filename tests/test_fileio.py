"""FileIO contract: LocalFileIO and HadoopFileIO must behave
identically for the operations the lake/engine perform, and a LakeTable
must work end-to-end over HadoopFileIO (file:// scheme exercises the
real org.apache.hadoop.fs API surface that hdfs://, s3a://, gs://
share)."""

import os

import pytest

from filters_spark.lake.fileio import HadoopFileIO, LocalFileIO, fileio_for


@pytest.fixture(params=["local", "hadoop"])
def io_impl(request, spark, tmp_path):
    if request.param == "local":
        return LocalFileIO(), str(tmp_path)
    return HadoopFileIO(spark, f"file://{tmp_path}"), str(tmp_path)


class TestFileIOContract:
    def test_roundtrip_and_listing(self, io_impl):
        io, root = io_impl
        d = os.path.join(root, "a", "b")
        io.makedirs(d)
        assert io.isdir(d) and io.exists(d)
        io.write_text_atomic(os.path.join(d, "x.json"), '{"k": 1}')
        assert io.read_text(os.path.join(d, "x.json")) == '{"k": 1}'
        io.write_text_atomic(os.path.join(d, "x.json"), '{"k": 2}')  # replace
        assert io.read_text(os.path.join(d, "x.json")) == '{"k": 2}'
        assert io.listdir(d) == ["x.json"]
        assert io.listdir(os.path.join(root, "missing")) == []

    def test_create_exclusive(self, io_impl):
        io, root = io_impl
        io.makedirs(root)
        p = os.path.join(root, "snap-1.json")
        io.write_text_atomic(p, "first", fail_if_exists=True)
        with pytest.raises(FileExistsError):
            io.write_text_atomic(p, "second", fail_if_exists=True)
        assert io.read_text(p) == "first"

    def test_move_and_tree_scan(self, io_impl):
        io, root = io_impl
        src = os.path.join(root, "stage", "_dead=true")
        io.makedirs(src)
        io.write_text_atomic(os.path.join(src, "part-0.parquet"), "data")
        assert io.tree_has_suffix(os.path.join(root, "stage"), ".parquet")
        dst = os.path.join(root, "dead_letter", "batch-1")
        io.move(src, dst)
        assert not io.exists(src)
        assert io.listdir(dst) == ["part-0.parquet"]
        io.rmtree(os.path.join(root, "dead_letter"))
        assert not io.exists(dst)
        assert not io.tree_has_suffix(os.path.join(root, "missing"), ".parquet")

    def test_copy_byte_exact_into_fresh_parent(self, io_impl):
        # the deep-clone primitive: byte-exact, creates the destination
        # parent, refuses nothing (clone layers its own no-overwrite
        # guard); exercised over the Hadoop FS API via file:// too
        io, root = io_impl
        src = os.path.join(root, "src", "data.bin")
        io.makedirs(os.path.join(root, "src"))
        io.write_text_atomic(src, "payload-bytes é中")
        dst = os.path.join(root, "fresh", "nested", "copy.bin")
        io.copy(src, dst)
        assert io.read_text(dst) == "payload-bytes é中"
        assert io.exists(src)  # copy, not move


def test_fileio_for_scheme_routing(spark):
    assert isinstance(fileio_for(spark, "/tmp/x"), LocalFileIO)
    # file: URIs must go through Hadoop FS: LocalFileIO's raw os.* calls
    # would treat the URI as a literal relative path (review regression)
    assert isinstance(fileio_for(spark, "file:/tmp/x"), HadoopFileIO)
    assert isinstance(fileio_for(spark, "hdfs://nn/x"), HadoopFileIO)


def test_lake_table_over_hadoop_fileio(spark, tmp_path):
    """Full create -> commit -> read -> time-travel cycle with every
    metadata op going through the Hadoop FileSystem API."""
    import pyspark.sql.functions as F

    from filters_spark.lake.table import LakeTable, bucket_expr

    root = str(tmp_path / "lake")
    t = LakeTable.create(spark, root, key_cols=["repo", "path"], num_buckets=4)
    t.io = HadoopFileIO(spark, f"file://{root}")  # force the DFS impl

    df = spark.createDataFrame(
        [("r1", "a.py", "c1", 1, "py", "x", "sha1"), ("r2", "b.py", "c2", 2, "py", "y", "sha2")],
        "repo string, path string, commit string, event_seq long, lang string, content string, content_sha string",
    ).withColumn("_bucket", bucket_expr(F.col("repo"), F.col("path"), 4))
    touched = [r["_bucket"] for r in df.select("_bucket").distinct().collect()]
    snap = t.commit_buckets(df, touched, {b: "c2:0000000002" for b in touched})
    assert snap["snapshot_id"] == 1
    assert t.read().count() == 2
    assert t.snapshots() == [0, 1]
    assert t.read(snapshot_id=0) is None  # time travel to empty
