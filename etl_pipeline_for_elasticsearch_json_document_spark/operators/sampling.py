"""Deterministic sampling / dataset-split operators.

Training pipelines need splits that are (a) stable across runs and engines,
(b) a pure function of the row key — never ``rand()`` — so re-processing a
shard, backfilling, or changing partition counts can't move a document
between train and test (leakage). The primitive is a hash bucket:

    bucket(id) = first hex nibble of md5(id)   ∈ {0..9, a..f}

Everything downstream (split label, per-mille sampling) is a comparison on
that bucket — map-only, shuffle-free, pushdown-friendly, and bit-identical
in any engine with md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, nibbles: int = 1) -> Column:
    """Hex-string bucket of md5(key): ``nibbles`` hex chars → 16^nibbles
    buckets. String comparison on it is uniform and engine-portable."""
    return F.substring(F.md5(key.cast("string")), 1, nibbles)


def split_label(
    key: Column, train: str = "c", val: str = "e"
) -> Column:
    """Deterministic train/val/test label from one md5 nibble: buckets
    below ``train`` → 'train' (12/16 = 75 %), below ``val`` → 'val'
    (2/16), rest → 'test' (2/16). Thresholds are hex-char boundaries so
    the comparison stays a plain string <."""
    b = hash_bucket(key)
    return (
        F.when(b < F.lit(train), "train").when(b < F.lit(val), "val").otherwise("test")
    )


def deterministic_sample(df: DataFrame, key_col: str, per_16: int) -> DataFrame:
    """Keep ≈ per_16/16 of rows, chosen by hash bucket of the key —
    repeatable, engine-portable, and independent of partitioning (unlike
    ``df.sample``, whose output depends on the partition layout)."""
    assert 0 < per_16 <= 16
    threshold = format(per_16, "x")  # e.g. 4 -> '4': buckets 0..3 pass
    return df.filter(hash_bucket(F.col(key_col)) < F.lit(threshold))
