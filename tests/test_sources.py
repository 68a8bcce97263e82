"""Source/sink round-trips incl. period-partitioned layout (the
partition-pruning write path) and pipeline pickling."""

import os
import pickle
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from panelsplit_spark import (
    LinearRegression,
    PanelSplit,
    SequentialCVPipeline,
    read_source,
    write_sink,
)


def test_csv_json_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="pss_src_")
    try:
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
        )
        for fmt in ("csv", "json", "parquet"):
            p = os.path.join(d, fmt)
            write_sink(df, p, format=fmt)
            back = read_source(
                spark, p, format=fmt,
                **({"inferSchema": "true"} if fmt == "csv" else {}),
            )
            got = sorted(
                (int(r["id"]), r["s"], float(r["v"]))
                for r in back.collect()
            )
            assert got == [(1, "a", 1.5), (2, "b", 2.5)]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes(spark):
    d = tempfile.mkdtemp(prefix="pss_part_")
    try:
        rows = [(p, float(i)) for i, p in enumerate([1, 1, 2, 2, 3, 3, 4, 4])]
        df = spark.createDataFrame(rows, "period int, x double")
        p = os.path.join(d, "t")
        write_sink(df, p, partition_by="period")
        back = read_source(spark, p)
        ps = PanelSplit(back, "period", n_splits=2)
        plan = (
            back.where(ps.train_filter(0))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # period is now a partition column: pruning, not data filters
        assert "PartitionFilters" in plan
        assert back.where(ps.train_filter(0)).count() == 4
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pipeline_pickle_roundtrip(spark):
    rows = [
        (p, float(p * 10 + j), float(p * 20 + j))
        for p in range(1, 7)
        for j in range(2)
    ]
    df = spark.createDataFrame(rows, "period int, x double, y double")
    ps = PanelSplit(df, "period", n_splits=2)
    pipe = SequentialCVPipeline(
        [("reg", LinearRegression())], [ps], ["x"], y_col="y"
    )
    pipe.fit(df)
    blob = pickle.dumps(pipe)
    pipe2 = pickle.loads(blob)
    a = sorted(
        (r["period"], r["prediction"]) for r in pipe.predict(df).collect()
    )
    b = sorted(
        (r["period"], r["prediction"]) for r in pipe2.predict(df).collect()
    )
    assert a == b and len(a) > 0


def test_bucketed_join_is_exchange_free(spark):
    """Bucketed layout moves the join shuffle to write time: a join on
    the bucket key must plan with NO Exchange on either side."""
    from panelsplit_spark.sources.tables import write_bucketed_table

    left = spark.range(0, 1000).selectExpr(
        "id AS k", "id * 2.0 AS v_l"
    )
    right = spark.range(0, 1000).selectExpr(
        "id AS k", "id * 3.0 AS v_r"
    )
    write_bucketed_table(left, "bkt_left", "k", 4, sort_cols="k")
    write_bucketed_table(right, "bkt_right", "k", 4, sort_cols="k")
    # tiny test tables would broadcast (which bypasses bucketing);
    # force the shuffle-join planner path a big-table join would take
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l, r = spark.table("bkt_left"), spark.table("bkt_right")
        joined = l.join(r, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 1000
        got = joined.where("k = 7").collect()[0]
        assert (float(got["v_l"]), float(got["v_r"])) == (14.0, 21.0)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_compact_parquet_preserves_data(spark, tmp_path):
    """Compaction collapses a many-small-files dataset into the sized
    file count and preserves every row."""
    from panelsplit_spark.sources.tables import compact_parquet

    src = str(tmp_path / "many")
    dst = str(tmp_path / "compact")
    spark.range(0, 10_000).selectExpr(
        "id", "id % 7 AS k"
    ).repartition(40).write.parquet(src)
    import os as _os

    n_src = sum(
        1 for f in _os.listdir(src) if f.endswith(".parquet")
    )
    assert n_src == 40
    n_out = compact_parquet(
        spark, src, dst, target_file_mb=256, sort_within_by="id"
    )
    assert n_out == 1  # 10k tiny rows fit one 256MB target file
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_compact_parquet_refuses_in_place(spark, tmp_path):
    """dst == src would overwrite a lazily-read source mid-read."""
    import pytest

    from panelsplit_spark.sources.tables import compact_parquet

    p = str(tmp_path / "d")
    spark.range(10).write.parquet(p)
    with pytest.raises(ValueError, match="dst_path must differ"):
        compact_parquet(spark, p, str(tmp_path / "d"))


def test_ensure_splittable_layout_rewrites_fat_row_groups(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from panelsplit_spark.sources.tables import ensure_splittable_layout

    src = str(tmp_path / "fat.parquet")
    n = 20_000
    pq.write_table(
        pa.table({"k": list(range(n)), "v": [float(i) for i in range(n)]}),
        src,
        row_group_size=n,  # the pathological single-group shape
    )
    out = ensure_splittable_layout(spark, src)
    assert out != src, "single fat row group must be re-laid-out"
    pf = pq.ParquetFile(out)
    assert pf.metadata.num_rows == n
    assert pf.metadata.num_row_groups > 1
    # contents identical
    assert pq.read_table(out).sort_by("k").equals(
        pq.read_table(src).sort_by("k")
    )
    # cache hit: same path returned without rework
    assert ensure_splittable_layout(spark, src) == out


def test_ensure_splittable_layout_leaves_good_files_alone(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from panelsplit_spark.sources.tables import ensure_splittable_layout

    small = str(tmp_path / "small.parquet")
    pq.write_table(pa.table({"k": list(range(100))}), small)
    assert ensure_splittable_layout(spark, small) == small

    fine = str(tmp_path / "fine.parquet")
    pq.write_table(
        pa.table({"k": list(range(20_000))}), fine, row_group_size=512
    )
    assert ensure_splittable_layout(spark, fine) == fine

    assert (
        ensure_splittable_layout(spark, str(tmp_path / "missing.parquet"))
        == str(tmp_path / "missing.parquet")
    )


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """enable_runtime_filters(aggressive=True) must inject a bloom
    might_contain predicate on the fact side of a selective dim join
    (the InjectRuntimeFilter shape that prunes the fact scan at scale),
    and must not change the join result."""
    from pyspark.sql import functions as F

    from panelsplit_spark.sources.tables import (
        enable_runtime_filters,
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").where(
        F.col("p_retailprice") > 915
    )
    baseline = li.join(part, li["l_partkey"] == part["p_partkey"]).count()
    assert baseline > 0  # the pruned join must still produce rows

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a shuffle join (bloom injection targets non-broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        enable_runtime_filters(spark, aggressive=True)
        j = li.join(part, li["l_partkey"] == part["p_partkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan
        assert j.count() == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "10GB",
        )
