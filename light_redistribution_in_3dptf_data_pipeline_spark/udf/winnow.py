"""Arrow-vectorized MOSS winnowing — the production fast path.

``queries/text.with_winnow_stats`` defines the fingerprint in pure
Column algebra (and the DuckDB oracle restates it), but higher-order-
function lambdas are interpreted row-at-a-time expressions in Spark:
~0.6 ms/doc, which is ~170 CPU-days per billion documents. The same
arithmetic in numpy over Arrow batches is ~100x cheaper — this is the
sanctioned Pandas-UDF escape hatch for per-character hot loops the
built-ins cannot vectorize (cf. pyspark guide: Arrow batch > HOF
interpretation for char-level work).

Bit-identical to the Column form by construction (identical mod-
Horner constants on identical codepoint sequences) and pinned by
``tests/test_winnow.py`` equivalence tests, so the registered tx1
query can use this path while the oracle checks the semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def winnow_fps_np(text: str, k: int, w: int, base: int,
                  mod: int) -> np.ndarray:
    """Distinct winnowed k-gram hashes of ``text`` (sorted int64
    array) — vectorized Horner over the codepoint array."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
            .astype(np.int64)
    n = cps.size
    if n < k:
        return np.empty(0, dtype=np.int64)
    m = n - k + 1
    acc = np.zeros(m, dtype=np.int64)
    for j in range(k):  # k vectorized passes, not per-gram loops
        acc = (acc * base + cps[j:j + m]) % mod
    if m < w:
        wins = acc.min(keepdims=True)
    else:
        from numpy.lib.stride_tricks import sliding_window_view

        wins = sliding_window_view(acc, w).min(axis=1)
    return np.unique(wins)


def winnow_np(text: str, k: int, w: int, base: int, mod: int
              ) -> tuple[int, int]:
    """(set size, exact sum) of the distinct winnowed k-gram hashes of
    ``text`` — the scalar fold of :func:`winnow_fps_np`."""
    fps = winnow_fps_np(text, k, w, base, mod)
    return int(fps.size), int(fps.sum())


def with_winnow_stats_arrow(df: DataFrame,
                            text_col: str = "text") -> DataFrame:
    """Append ``n_winnow_fp`` / ``winnow_digest`` via one mapInPandas
    stage — a pure map (no shuffle), Arrow batch transfer, all other
    columns passed through."""
    from ..queries.text import WINNOW_B, WINNOW_K, WINNOW_M, WINNOW_W

    schema = StructType(df.schema.fields
                        + [StructField("n_winnow_fp", LongType()),
                           StructField("winnow_digest", LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [winnow_np(t if isinstance(t, str) else "",
                               WINNOW_K, WINNOW_W, WINNOW_B, WINNOW_M)
                     for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf["n_winnow_fp"] = [s[0] for s in stats]
            pdf["winnow_digest"] = [s[1] for s in stats]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def with_winnow_fps_arrow(df: DataFrame, text_col: str = "text",
                          out: str = "winnow_fps") -> DataFrame:
    """Append the distinct winnowed fingerprint ARRAY via one
    mapInPandas stage — the fast path behind the passage-duplicate
    index (operators/dedup.winnow_fingerprint_rows), where the whole
    set is needed, not its scalar fold. Identical output to the
    Column form ``queries/text.with_winnow_fingerprints`` up to array
    order (this one is sorted, that one window-ordered; every
    consumer explodes or set-compares) — pinned by
    tests/test_winnow.py."""
    from pyspark.sql.types import ArrayType

    from ..queries.text import WINNOW_B, WINNOW_K, WINNOW_M, WINNOW_W

    schema = StructType(df.schema.fields
                        + [StructField(out, ArrayType(LongType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [
                winnow_fps_np(t if isinstance(t, str) else "",
                              WINNOW_K, WINNOW_W, WINNOW_B,
                              WINNOW_M).tolist()
                for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)
