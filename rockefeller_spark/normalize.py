"""Column-name normalization as a zero-cost driver-side metadata op.

Re-expresses the reference's ``ReadyDF.normalize`` (regex at
``/root/reference/scripts/tools/df_manipulation.py:30``, pandas impl
``:62-80``, polars impl ``:82-100``, dispatch ``:103-114``): lowercase,
squash any run of non-alphanumerics to ``_``, strip edge underscores.
Unlike the reference there is no per-engine dispatch and no data movement —
renaming columns on a Spark DataFrame only rewrites the logical plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

NORMALIZE_PATTERN = re.compile(r"[^a-zA-Z0-9]+")


def normalize_name(name: str) -> str:
    """'Stock Splits' -> 'stock_splits'; 'Op. Margin (%)' -> 'op_margin'."""
    return NORMALIZE_PATTERN.sub("_", name.lower()).strip("_")


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column to its normalized form. Empty input (no
    columns) is rejected, matching the reference's guard
    (``/root/reference/scripts/tools/df_manipulation.py:68-69``)."""
    if not df.columns:
        raise ValueError("DataFrame has no columns to normalize")
    new_names = [normalize_name(c) for c in df.columns]
    dupes = {n for n in new_names if new_names.count(n) > 1}
    if dupes:
        raise ValueError(f"normalization would collide column names: {sorted(dupes)}")
    return df.toDF(*new_names)
