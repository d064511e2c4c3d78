"""lnrm — the lower-cased normal form used for alias keys.

Semantics re-implemented from the reference's ``get_lnrm``
(bootleg/utils/utils.py:259-293, itself from the Stanford TAC-KBP
paper, section 2.3): NFD-normalize, drop combining marks, keep only
alphanumerics and spaces, lowercase, collapse internal whitespace.

This function defines the keys of the alias→candidate map and therefore
directly controls precision/recall against the reference — it must stay
behaviorally identical. It is a pure Python function applied inside
Arrow-batched pandas UDFs (never per-row Spark Python UDFs); for pure
ASCII corpora :func:`lnrm_ascii_col` is an equivalent JVM-side
whole-stage-codegen expression used on the hot path.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@lru_cache(maxsize=1 << 18)
def lnrm(s: str, strip: bool = True, lower: bool = True) -> str:
    """Lower-cased normalized form of ``s`` (see module docstring).

    Memoized (token/alias inputs are Zipfian; caching changes no output,
    only skips recomputing the NFD pass on repeat tokens)."""
    if not strip and not lower:
        return s
    out = str(s)
    if lower:
        out = out.lower()
    if strip:
        out = unicodedata.normalize("NFD", out)
        out = "".join(
            ch
            for ch in out
            if (not unicodedata.combining(ch) and ch.isalnum()) or ch == " "
        ).strip()
    return " ".join(out.split())


def lnrm_series(s: pd.Series) -> pd.Series:
    """Vectorized lnrm over a pandas Series (for use inside pandas UDFs)."""
    return s.map(lambda x: lnrm(x) if x is not None else None)


@pandas_udf(StringType())
def lnrm_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    """Arrow-batched lnrm as a Spark column function."""
    return lnrm_series(s)


def lnrm_ascii_col(col: Column) -> Column:
    """JVM-side lnrm for ASCII-only text (fast path, codegen-friendly).

    Equal to :func:`lnrm` whenever the input contains only ASCII
    characters (no NFD decomposition applies); used for the synthetic
    benchmark corpora and mirrored 1:1 in the DuckDB oracle SQL.
    """
    cleaned = F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", "")
    collapsed = F.regexp_replace(cleaned, r" +", " ")
    return F.trim(collapsed)


def lnrm_ascii_sql(expr: str) -> str:
    """ANSI-SQL mirror of :func:`lnrm_ascii_col` (DuckDB oracle)."""
    return (
        "trim(regexp_replace(regexp_replace(lower(" + expr + "), "
        "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    )
