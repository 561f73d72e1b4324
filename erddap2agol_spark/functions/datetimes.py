"""Datetime functions (SURVEY §2.8 F1-F5).

F1 is the reference's "universal datetime decoder"
(Converters/Support/datetimeUtils.py:15-252): infer the format of an
arbitrary datetime string — month names, 2/4-digit years, am/pm, ordinal
suffixes, day-of-year, ±epoch seconds/millis, timezone abbreviations and
offsets — and normalize to UTC. Full generality needs Python, so this is
the one deliberate Pandas-UDF surface in the function layer: Arrow-batched
(not per-row), and used only when the cheap JVM-side ``to_timestamp``
candidates (:func:`decode_datetime_fast`) can't express the input.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Fast path: the common ERDDAP/feed formats, tried in order JVM-side.
FAST_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "dd/MM/yyyy",  # F5: user date args (reference src/core.py:468)
    # RFC-822 pubDate ("Tue, 05 Mar 2024 ...") falls to the pandas UDF:
    # Spark >= 3 can't PARSE day-of-week patterns ('E' is format-only)
)

#: Timezone abbreviation -> UTC offset hours (public, partial — the
#: reference tables ~190; the unambiguous common ones suffice here and
#: the table is extensible).
TZ_ABBREV: dict[str, float] = {
    "UTC": 0, "GMT": 0, "Z": 0,
    "EST": -5, "EDT": -4, "CST": -6, "CDT": -5,
    "MST": -7, "MDT": -6, "PST": -8, "PDT": -7,
    "AKST": -9, "AKDT": -8, "HST": -10,
    "CET": 1, "CEST": 2, "EET": 2, "EEST": 3, "BST": 1, "IST": 5.5,
    "AEST": 10, "AEDT": 11, "JST": 9, "NZST": 12, "NZDT": 13,
}

_ORDINAL_RE = re.compile(r"\b(\d{1,2})(st|nd|rd|th)\b", re.IGNORECASE)
_EPOCH_RE = re.compile(r"^[+-]?\d{1,13}$")


def decode_datetime_fast(col: Column, formats: tuple[str, ...] = FAST_FORMATS) -> Column:
    """JVM-side candidate-format decode: coalesce of ``to_timestamp``
    attempts plus 10/13-digit epoch handling. NULL when nothing matches —
    chain with :func:`decode_datetime_udf` for the long tail."""
    digits = F.regexp_replace(col, r"[^0-9+-]", "")
    is_epoch = col.rlike(r"^[+-]?\d{10}$")
    is_epoch_ms = col.rlike(r"^[+-]?\d{13}$")
    candidates = [F.try_to_timestamp(col, F.lit(fmt)) for fmt in formats]
    return (
        F.when(is_epoch_ms, F.timestamp_millis(col.cast("bigint")))
        .when(is_epoch, F.timestamp_seconds(col.cast("bigint")))
        .otherwise(F.coalesce(*candidates, F.try_to_timestamp(col)))
    )


def _decode_one(s: str | None) -> datetime | None:
    if s is None:
        return None
    s = s.strip()
    if not s:
        return None
    # ±epoch: 10-digit seconds / 13-digit millis (also small ints = seconds)
    if _EPOCH_RE.match(s):
        v = int(s)
        if len(s.lstrip("+-")) == 13:
            v = v / 1000.0
        return datetime.fromtimestamp(float(v), tz=timezone.utc).replace(tzinfo=None)
    # ordinal suffixes: "March 3rd, 2024" -> "March 3, 2024"
    s = _ORDINAL_RE.sub(r"\1", s)
    # trailing tz abbreviation
    tz_offset_h: float | None = None
    m = re.search(r"\b([A-Z]{1,5})$", s)
    if m and m.group(1) in TZ_ABBREV:
        tz_offset_h = TZ_ABBREV[m.group(1)]
        s = s[: m.start()].strip()
    try:
        ts = pd.to_datetime(s, utc=False, format="mixed", dayfirst=False)
    except (ValueError, TypeError):
        try:
            ts = pd.to_datetime(s, utc=False, dayfirst=True)
        except (ValueError, TypeError):
            return None
    if ts is pd.NaT:
        return None
    dt = ts.to_pydatetime()
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    elif tz_offset_h is not None:
        dt = datetime.fromtimestamp(
            dt.replace(tzinfo=timezone.utc).timestamp() - tz_offset_h * 3600,
            tz=timezone.utc,
        ).replace(tzinfo=None)
    return dt


@F.pandas_udf(T.TimestampType())
def decode_datetime_udf(s: pd.Series) -> pd.Series:
    """F1 long tail as an Arrow-batched pandas UDF (UTC-naive output)."""
    return s.map(_decode_one)


def decode_datetime(col: Column) -> Column:
    """The full F1 operator: fast JVM path first, pandas UDF only for
    rows the fast path couldn't parse (the UDF runs on every row but its
    result is used only as fallback; keep it off hot paths where the fast
    formats are known to cover the data)."""
    return F.coalesce(decode_datetime_fast(col), decode_datetime_udf(col))


def iso_z_format(col: Column) -> Column:
    """F3: ISO-8601 'Z' rendering (src/data_wrangler.py:363-365)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss'Z'")
