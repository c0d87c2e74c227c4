"""Small-file compaction: row preservation, file-count reduction,
no-new-appends no-op, and the read path folding post-compaction
appends back in."""

import os

from pyspark.sql import functions as F

from trignis_spark.maintenance import ParquetCompactor, _data_files


def _append(spark, path, start, n):
    spark.range(start, start + n).withColumn(
        "payload", F.concat(F.lit("row-"), F.col("id"))
    ).coalesce(1).write.mode("append").parquet(path)


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "store")
    for i in range(6):  # six per-epoch appends = six small files
        _append(spark, path, 100 * i, 50)
    assert len(_data_files(path)) == 6

    comp = ParquetCompactor(path, target_file_bytes=10**9)
    assert comp.compact(spark) == 1  # everything fits one target file

    got = comp.read(spark)
    assert got.count() == 300
    assert got.select(F.sum("id")).first()[0] == sum(
        sum(range(100 * i, 100 * i + 50)) for i in range(6)
    )
    # raw files still present (append target), compacted gen exists
    assert len(_data_files(path)) == 6
    assert comp.current_generation(comp._ctx) is not None


def test_recompaction_without_new_appends_is_noop(spark, tmp_path):
    path = str(tmp_path / "store")
    _append(spark, path, 0, 50)
    comp = ParquetCompactor(path)
    assert comp.compact(spark) == 1
    assert comp.compact(spark) == 0  # same inputs: replay fast path


def test_read_folds_in_appends_after_compaction(spark, tmp_path):
    path = str(tmp_path / "store")
    _append(spark, path, 0, 50)
    comp = ParquetCompactor(path)
    comp.compact(spark)

    _append(spark, path, 1000, 25)  # lands after the compaction watermark
    got = comp.read(spark)
    assert got.count() == 75
    assert got.filter("id >= 1000").count() == 25

    # the next compaction folds the newcomers in
    assert comp.compact(spark) == 1
    assert comp.read(spark).count() == 75


def test_read_before_any_compaction_serves_raw(spark, tmp_path):
    path = str(tmp_path / "store")
    _append(spark, path, 0, 10)
    assert ParquetCompactor(path).read(spark).count() == 10
