"""Vectorized (Arrow) pandas UDFs — the sanctioned slow path.

NOTE: deliberately NO ``from __future__ import annotations`` here:
pandas_udf resolves the type hints at decoration time, and stringified
annotations from the future import break that resolution.
"""

import hashlib
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf

_STRIP = re.compile(r"[^a-z0-9 ]")
_SPACES = re.compile(r" +")


@pandas_udf("string")
def fingerprint_pandas(texts: pd.Series) -> pd.Series:
    """Vectorized twin of operators/text.fingerprint (md5 of normalized
    text) — oracle-identical to the native Column implementation."""

    def one(t: str) -> str:
        norm = _SPACES.sub(" ", _STRIP.sub("", t.lower())).strip()
        return hashlib.md5(norm.encode("utf-8")).hexdigest()

    return texts.map(one)
