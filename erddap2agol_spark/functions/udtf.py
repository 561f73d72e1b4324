"""Python UDTF + grouped-agg Pandas UDF surface (SURVEY §2.10).

The reference's converter protocol (X1, operators/convert.py) covers
row-shape plugins; these two fill the remaining cells of the UDF
matrix the way Spark wants them filled:

- **UDTF** (``@udtf``, Spark 3.5+): a table function — one input row,
  N output rows — for expansion logic that genuinely needs Python
  (stateful tokenizers, format sniffers).  Arrow-batched; still the
  slow path vs built-in explode, so the docstring of each UDTF must
  say why Column algebra can't express it.  The demo here
  (sentence segmentation with per-sentence char offsets) IS
  expressible in SQL — which is exactly what makes it testable
  against a Column-algebra twin.
- **Grouped-agg Pandas UDF**: a custom aggregate over a whole group's
  values as a pandas Series — the UDAF cell.  ``weighted_median`` is
  the canonical one Spark lacks natively.  Arrow moves each group's
  column once; the shuffle is the same hash partition a built-in agg
  would do; only the per-group reduction runs in Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def make_sentence_udtf():
    """Build (lazily — the decorator needs a live Spark context) the
    sentence-segmentation UDTF: ``(doc_id, text)`` -> one row per
    sentence with ``(doc_id, sent_idx, sentence, start_char)``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id int, sent_idx int, sentence string, start_char int")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            idx = 0
            sent_start = None  # first non-space char of the pending sentence
            for i, ch in enumerate(text):
                if ch in ".!?":
                    if sent_start is not None:
                        yield doc_id, idx, text[sent_start : i + 1], sent_start
                        idx += 1
                        sent_start = None
                elif not ch.isspace() and sent_start is None:
                    sent_start = i
            if sent_start is not None:
                tail = text[sent_start:].rstrip()
                if tail:
                    yield doc_id, idx, tail, sent_start

    return SentenceSplit


@F.pandas_udf(T.DoubleType())
def weighted_median(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-agg Pandas UDF (the Series -> scalar signature selects
    the GROUPED_AGG eval type): median of ``values`` weighted by
    ``weights`` (lower interpolation: the smallest value whose
    cumulative weight reaches half the total).  One Arrow transfer per
    group; deterministic for any ordering of the group's rows because
    the series is sorted before accumulation."""
    df = pd.DataFrame({"v": values, "w": weights}).dropna()
    if df.empty:
        return None
    df = df.sort_values(["v", "w"]).reset_index(drop=True)
    half = df["w"].sum() / 2.0
    cum = df["w"].cumsum()
    return float(df.loc[cum >= half, "v"].iloc[0])
