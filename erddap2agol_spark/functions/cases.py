"""Case-transform functions (SURVEY §2.8 ``case`` DSL op).

The reference supports Upper/Lower/Capital/AllCapital/Title/Camel/camel/
Acronym (Converters/Json2GeoJSON.py:130-160). Upper/Lower/Capital map to
built-ins; the multi-word transforms are expressed with ``transform`` over
``split`` — still JVM-side, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minor words the reference's Title case leaves lowercase when not first
#: (Converters/Json2GeoJSON.py:141-147).
TITLE_MINOR_WORDS = (
    "a an and as at but by for if in nor of off on or per so the to up via yet"
).split()


def _cap_word(w: Column) -> Column:
    return F.concat(F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, 1 << 30)))


def apply_case(col: Column, mode: str) -> Column:
    # the multi-word modes assemble via concat_ws, which maps a NULL
    # input to '' — mask them back to NULL so every mode propagates
    # NULL like the single-word ones (and the DSL's `default` op,
    # which exists for exactly that, still fires after a case op)
    if mode in ("Title", "Camel", "camel", "Acronym"):
        return F.when(col.isNotNull(), _apply_case_nonnull(col, mode))
    return _apply_case_nonnull(col, mode)


def _apply_case_nonnull(col: Column, mode: str) -> Column:
    if mode == "Upper" or mode == "AllCapital":
        return F.upper(col)
    if mode == "Lower":
        return F.lower(col)
    if mode == "Capital":  # first letter of the whole value
        return F.concat(F.upper(F.substring(col, 1, 1)), F.substring(col, 2, 1 << 30))
    if mode == "Title":  # capitalize each word except minor words (non-first)
        words = F.split(col, " ")
        minor = F.array(*[F.lit(w) for w in TITLE_MINOR_WORDS])
        titled = F.transform(
            words,
            lambda w, i: F.when(
                (i > 0) & F.array_contains(minor, F.lower(w)), F.lower(w)
            ).otherwise(_cap_word(w)),
        )
        return F.concat_ws(" ", titled)
    if mode == "Camel":  # UpperCamelCase, words joined
        return F.concat_ws("", F.transform(F.split(col, " "), _cap_word))
    if mode == "camel":  # lowerCamelCase
        words = F.split(col, " ")
        mixed = F.transform(
            words, lambda w, i: F.when(i == 0, F.lower(w)).otherwise(_cap_word(w))
        )
        return F.concat_ws("", mixed)
    if mode == "Acronym":  # initials of each word, uppercased
        return F.upper(
            F.concat_ws("", F.transform(F.split(col, " "), lambda w: F.substring(w, 1, 1)))
        )
    raise ValueError(f"unknown case mode {mode!r}")
