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


def _normalized_names(columns) -> list[str]:
    cols = list(columns)
    if not cols:
        raise ValueError("DataFrame has no columns to normalize")
    new_names = [normalize_name(c) for c in cols]
    dupes = {n for n in new_names if new_names.count(n) > 1}
    if dupes:
        raise ValueError(f"normalization would collide column names: {sorted(dupes)}")
    return new_names


def normalize_columns(df):
    """Rename every column to its normalized form. Empty input (no
    columns) is rejected, matching the reference's guard
    (``/root/reference/scripts/tools/df_manipulation.py:68-69``).

    Dispatches on the frame engine, mirroring the reference's dual
    pandas/polars injection (``df_manipulation.py:103-114``): Spark
    frames rename in the logical plan (zero data movement), pandas and
    polars frames rename driver-side metadata. Polars is optional in
    this environment, so its path is duck-typed (``rename`` with a
    positional mapping), never imported."""
    if isinstance(df, DataFrame):
        return df.toDF(*_normalized_names(df.columns))
    new_names = _normalized_names(getattr(df, "columns", []))
    mapping = dict(zip(list(df.columns), new_names))
    try:
        return df.rename(columns=mapping)       # pandas signature
    except TypeError:
        return df.rename(mapping)               # polars signature
