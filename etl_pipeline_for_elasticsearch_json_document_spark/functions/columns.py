"""Column-level convenience functions over flattened relations — the
reference's notebook analysis surface (A23, ``README.md:121-135``)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def columns_containing(df: DataFrame, substring: str, case_sensitive: bool = True) -> list[str]:
    """Column names containing a substring (``[c for c in df.columns if
    'Price' in c]``)."""
    if case_sensitive:
        return [c for c in df.columns if substring in c]
    s = substring.lower()
    return [c for c in df.columns if s in c.lower()]


def select_columns_containing(df: DataFrame, substring: str, **kw) -> DataFrame:
    """Projection by column-name pattern over the flattened relation."""
    return df.select(*columns_containing(df, substring, **kw))


def transpose_preview(df: DataFrame, n_rows: int = 1, n_cols: int = 50):
    """Driver-side transposed preview of a wide relation (``df.T.head(50)``)
    — returns a pandas DataFrame with one row per column."""
    pdf = df.limit(n_rows).toPandas()
    return pdf.T.head(n_cols)
