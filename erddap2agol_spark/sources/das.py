"""DAS (Dataset Attribute Structure) metadata model (SURVEY §2.1 S4).

The reference parses ERDDAP ``.das`` responses into a nested dict and
derives the projection column set, time extents, and geographic ranges
from it (``src/das_client.py:25-135`` parser, ``:186-231`` time extent,
``:299-389`` attribute filter; ``src/data_wrangler.py:224-233`` geo
range). Here the same metadata becomes a DataFrame of
``(dataset_id, variable, attr, datatype, value)`` rows — the FIXTURES.md
§6 shape — so schema derivation is plain relational algebra, unit-testable
and joinable against catalogs at any scale.

The parser is a fresh implementation of the public DAS text format
(OPeNDAP DAS spec): ``Attributes { <var> { <type> <name> <value>; ... } }``.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.projection import QC_SUFFIXES

#: coverage_content_type values whose variables are bookkeeping, not
#: measures (reference src/das_client.py:245-296).
SKIP_COVERAGE_TYPES = frozenset(
    {"qualityInformation", "referenceInformation", "thematicClassification"}
)

METADATA_COLUMNS = ("dataset_id", "variable", "attr", "datatype", "value")


def parse_das_text(text: str, dataset_id: str) -> list[tuple[str, str, str, str, str]]:
    """Parse DAS text into (dataset_id, variable, attr, datatype, value)
    tuples.

    Handles the format's essentials: an ``Attributes {`` wrapper, one
    block per variable (including ``NC_GLOBAL``), ``<datatype> <name>
    <value>;`` attribute lines, multi-line quoted string values, and
    comma-separated numeric ranges kept verbatim (``actual_range``).
    """
    rows: list[tuple[str, str, str, str, str]] = []
    var: str | None = None
    pending: list[str] = []  # continuation buffer for multi-line strings
    pending_head: tuple[str, str] | None = None  # (datatype, attr)

    def flush_pending() -> None:
        nonlocal pending, pending_head
        if pending_head is not None and var is not None:
            datatype, attr = pending_head
            value = "\n".join(pending).strip()
            if value.endswith(";"):
                value = value[:-1].rstrip()
            if value.startswith('"') and value.endswith('"') and len(value) >= 2:
                value = value[1:-1]
            rows.append((dataset_id, var, attr, datatype, value))
        pending, pending_head = [], None

    for raw in text.splitlines():
        line = raw.strip()
        if pending_head is not None:
            # Continuation of a multi-line quoted string: blank interior
            # lines are part of the value (summary/license attributes
            # routinely contain empty lines), so this check must come
            # before the blank-line skip.
            pending.append(line)
            if line.endswith(";"):
                flush_pending()
            continue
        if not line or line == "Attributes {":
            continue
        if line == "}":
            var = None
            continue
        if line.endswith("{"):
            var = line[:-1].strip()
            continue
        if var is None:
            continue
        parts = line.split(None, 2)
        if len(parts) < 2:
            continue
        datatype, attr = parts[0], parts[1]
        value = parts[2] if len(parts) == 3 else ""
        if value.count('"') % 2 == 1 or (value.startswith('"') and not value.rstrip(";").rstrip().endswith('"')):
            pending_head = (datatype, attr)
            pending = [value]
            continue
        if value.endswith(";"):
            value = value[:-1].rstrip()
        if value.startswith('"') and value.endswith('"') and len(value) >= 2:
            value = value[1:-1]
        rows.append((dataset_id, var, attr, datatype, value))
    # A pending buffer at EOF is an UNTERMINATED string literal — a
    # truncated response.  Drop it rather than emit a half-parsed value:
    # a line-boundary truncation of any document then parses to an exact
    # prefix of the full parse (fuzz-asserted), matching the decoder
    # garbage contract (malformed input -> absent, never wrong).
    return rows


def das_to_dataframe(spark: SparkSession, das_texts: dict[str, str]) -> DataFrame:
    """Parse one DAS text per dataset_id into the metadata DataFrame."""
    rows = [r for ds, text in das_texts.items() for r in parse_das_text(text, ds)]
    return spark.createDataFrame(rows, schema=list(METADATA_COLUMNS))


def das_from_urls(
    spark: SparkSession,
    urls: dict[str, str],
    attempts: int = 3,
    timeout_s: float = 120.0,
    max_workers: int = 8,
) -> tuple[DataFrame, dict[str, str]]:
    """S4 on the wire: fetch each dataset's ``.das`` document
    (``{server}/tabledap/{id}.das``) and parse into the metadata
    DataFrame. The fetch is the DRIVER-side deque-requeue loop
    (``http_fetch.fetch_all`` — the reference's exact discipline,
    das_client fetching metadata per dataset before any data moves): a
    fleet of .das documents is kilobytes each, so this is planner work,
    not a data path. Returns ``(metadata_df, failures)`` — a dataset
    that exhausts its attempts is reported, not raised, so one dead
    endpoint never kills the fleet's metadata sweep (O13 discipline).
    """
    from .http_fetch import fetch_all

    by_url = {url: ds for ds, url in urls.items()}
    results, failures = fetch_all(
        list(urls.values()),
        attempts=attempts,
        timeout_s=timeout_s,
        max_workers=max_workers,
    )
    # iterate the CALLER's dict, not the results dict: with concurrent
    # workers the latter is completion-ordered, which would make the
    # metadata frame's row layout vary run to run (review r5 #4)
    texts = {
        ds: results[u].decode() for ds, u in urls.items() if u in results
    }
    return das_to_dataframe(spark, texts), {
        by_url[u]: reason for u, reason in failures.items()
    }


# ---------------------------------------------------------------------------
# Schema derivation from metadata (P1/P2, pure relational)
# ---------------------------------------------------------------------------


def actual_attributes(meta: DataFrame, return_all: bool = False) -> DataFrame:
    """P1 as metadata algebra: per dataset, the variables that survive the
    reference's filter (``getActualAttributes`` src/das_client.py:299-389):
    drop QC/qartod/single-char/NC_GLOBAL names; keep variables that have an
    ``actual_range`` OR exactly one attribute.

    Output: (dataset_id, variable). All computed with one aggregate over
    the metadata table — no data scan.
    """
    per_var = meta.groupBy("dataset_id", "variable").agg(
        F.count(F.lit(1)).alias("n_attrs"),
        F.max(F.when(F.col("attr") == "actual_range", 1).otherwise(0)).alias("has_range"),
    )
    if not return_all:
        per_var = per_var.filter((F.col("has_range") == 1) | (F.col("n_attrs") == 1))
    out = per_var.select("dataset_id", "variable")
    if return_all:
        return out.filter(F.col("variable") != "NC_GLOBAL")
    # same name predicate as operators.projection.keep_attribute, expressed
    # as Column algebra so it runs JVM-side over arbitrarily large metadata
    cond = (
        (F.length("variable") >= 2)
        & (F.col("variable") != "NC_GLOBAL")
        & ~F.col("variable").startswith("qartod_")
    )
    for suf in QC_SUFFIXES:
        if suf.endswith("_"):
            cond = cond & ~F.col("variable").contains(suf)
        else:
            cond = cond & ~F.col("variable").endswith(suf)
    return out.filter(cond)


def grid_measure_variables(meta: DataFrame) -> DataFrame:
    """P2: griddap measure variables — everything that isn't a dimension/
    bookkeeping variable and isn't flagged by coverage_content_type
    (reference src/das_client.py:245-296)."""
    from ..operators.projection import GRID_DIM_NAMES

    flagged = (
        meta.filter(
            (F.col("attr") == "coverage_content_type")
            & F.col("value").isin(*SKIP_COVERAGE_TYPES)
        )
        .select("dataset_id", "variable")
        .distinct()
    )
    vars_ = meta.select("dataset_id", "variable").distinct()
    return (
        vars_.join(flagged, ["dataset_id", "variable"], "left_anti")
        .filter(~F.col("variable").isin(*GRID_DIM_NAMES))
        .filter(~F.col("variable").startswith("l2_"))
    )


def find_time_variables(meta: DataFrame) -> DataFrame:
    """Time-variable detection from metadata (reference: variables named
    ``time`` OR carrying ``ioos_category=Time`` OR epoch-seconds units —
    the ``datecollec``/``date_gmt`` alternates of src/das_client.py).
    Output: (dataset_id, variable)."""
    named = meta.filter(F.col("variable") == "time").select("dataset_id", "variable")
    categorized = meta.filter(
        (F.col("attr") == "ioos_category") & (F.col("value") == "Time")
    ).select("dataset_id", "variable")
    epoch_units = meta.filter(
        (F.col("attr") == "units")
        & F.col("value").startswith("seconds since 1970")
    ).select("dataset_id", "variable")
    return named.unionByName(categorized).unionByName(epoch_units).distinct()


def time_extent_from_meta(
    meta: DataFrame, now: datetime | None = None
) -> DataFrame:
    """A1/F2 from metadata: per dataset, (start, end) parsed from the time
    variable's ``actual_range`` of epoch seconds, end clamped to ``now``
    (reference src/das_client.py:186-231, negative epochs allowed, future
    ends clamped at :201-204). Metadata-only planning — no data scan (O4).
    """
    now = now or datetime.now(timezone.utc)
    now_lit = F.lit(now.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    rng = meta.filter(
        (F.col("variable") == "time") & (F.col("attr") == "actual_range")
    ).select(
        "dataset_id",
        F.split(F.regexp_replace("value", r"\s+", ""), ",").alias("parts"),
    )
    # F.get + try_cast: DAS metadata is remote content — an actual_range
    # with no comma or a non-numeric bound yields NULL start/end for that
    # dataset instead of an ANSI element_at/cast abort of the whole scan
    start = F.timestamp_seconds(F.get("parts", 0).try_cast("double"))
    end = F.timestamp_seconds(F.get("parts", 1).try_cast("double"))
    return rng.select(
        "dataset_id",
        start.alias("start_time"),
        # least() skips NULLs, which would turn a MISSING end bound into
        # "now"; an unknown end must stay NULL, only a future one clamps
        F.when(end.isNull(), end).otherwise(F.least(end, now_lit)).alias(
            "end_time"
        ),
    )


def geographic_range_from_meta(meta: DataFrame) -> DataFrame:
    """A4 from metadata: NC_GLOBAL geospatial_{lat,lon}_{min,max}
    (reference src/data_wrangler.py:224-233)."""
    keys = {
        "geospatial_lat_min": "lat_min",
        "geospatial_lat_max": "lat_max",
        "geospatial_lon_min": "lon_min",
        "geospatial_lon_max": "lon_max",
    }
    g = meta.filter(
        (F.col("variable") == "NC_GLOBAL") & F.col("attr").isin(*keys)
    )
    return g.groupBy("dataset_id").pivot("attr", list(keys)).agg(
        # try_cast: a non-numeric geospatial bound in remote metadata is
        # a NULL extent, not an ANSI abort of the whole metadata scan
        F.first(F.col("value").try_cast("double"))
    ).select(
        "dataset_id",
        *[F.col(src).alias(dst) for src, dst in keys.items()],
    )
