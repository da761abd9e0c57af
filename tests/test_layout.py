"""Z-order layout: Morton key correctness and the file-skipping property —
files written z-clustered keep BOTH key columns' min/max narrow, while a
single-column sort leaves the other column's per-file span at ~full range.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_pipeline_for_elasticsearch_json_document_spark.operators.layout import (
    write_zordered,
    zorder_key,
)
from etl_pipeline_for_elasticsearch_json_document_spark.sources.tables import load_table


def test_zorder_key_interleaves_bits(spark):
    # x=3 (bits 0,1 -> even positions 0,2 = 5), y=5 (bits 0,2 -> odd
    # positions 1,5 = 34): z = 39. And z is monotone in each coord's bits.
    got = (
        spark.range(1)
        .select(zorder_key(F.lit(3), F.lit(5)).alias("z"))
        .collect()[0]["z"]
    )
    assert got == 39


def _file_spans(path: str, col: str) -> tuple[list[float], float]:
    files = sorted(glob.glob(f"{path}/*.parquet"))
    spans, los, his = [], [], []
    for f in files:
        vals = pq.read_table(f, columns=[col])[col].to_pylist()
        spans.append(max(vals) - min(vals))
        los.append(min(vals))
        his.append(max(vals))
    return spans, (max(his) - min(los))


def test_zordered_files_are_narrow_in_both_columns(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "day", F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    )
    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    write_zordered(o, zpath, "o_custkey", "day", num_files=8)
    # single-column-sorted control: day spans stay ~global per file
    o.repartitionByRange(8, "o_custkey").sortWithinPartitions("o_custkey").write.mode(
        "overwrite"
    ).parquet(xpath)

    for col in ("o_custkey", "day"):
        spans, global_span = _file_spans(zpath, col)
        mean_span = sum(spans) / len(spans)
        assert mean_span < 0.75 * global_span, (col, mean_span, global_span)

    day_spans, day_global = _file_spans(xpath, "day")
    z_day_spans, _ = _file_spans(zpath, "day")
    # the z-layout's day clustering must beat the x-sorted layout's
    assert sum(z_day_spans) / len(z_day_spans) < 0.9 * sum(day_spans) / len(day_spans)
