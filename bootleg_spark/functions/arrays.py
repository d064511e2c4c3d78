"""Small array-column utilities.

``strip_nan_array`` re-expresses the reference's ``strip_nan``
(bootleg/utils/utils.py:296-313): NaN → NULL inside float arrays before
JSON serialization (ujson cannot carry NaN). The reference recurses over
nested Python lists; here each nesting level is one ``transform`` —
compose for nested arrays (``strip_nan_array2`` covers the
array<array<double>> case the prediction sink emits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _nan_to_null(x: Column) -> Column:
    return F.when(F.isnan(x), F.lit(None)).otherwise(x)


def strip_nan_array(col: Column) -> Column:
    """array<double> with every NaN replaced by NULL."""
    return F.transform(col, _nan_to_null)


def strip_nan_array2(col: Column) -> Column:
    """array<array<double>> variant (one transform per nesting level)."""
    return F.transform(col, lambda inner: F.transform(inner, _nan_to_null))
