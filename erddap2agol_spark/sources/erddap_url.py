"""ERDDAP query-URL compiler (SURVEY §2.3 P3/P4/P5, §3.1 stage 4).

In the Spark engine the "URL" is what a DataSourceV2 ERDDAP connector
would emit after Catalyst pushes projection and predicates into the scan
(O1/O2). This module is that compilation step, factored out so it is
golden-testable offline — the one test idea SURVEY §5 says is worth
inheriting from the reference (its tests compare generated URLs to
expected literals).

Semantics reproduced (from reference behavior, not code):
- tabledap: ``{server}/tabledap/{dataset}.csvp?time,col1,...&time>=S&time<=E``
  with ``depth`` forced to the front when present and the time column
  never duplicated (src/data_wrangler.py:322-387).
- URL encoding: ``,`` -> %2C, ``>=`` -> %3E%3D, ``<=`` -> %3C%3D,
  ``[``/``]`` -> %5B/%5D, ``:`` in hyperslabs left readable per ERDDAP
  convention (src/data_wrangler.py:341, 365).
- griddap: ``{server}/griddap/{dataset}.nc?var[(t0):stride:(t1)][(lat0):1:(lat1)][(lon0):1:(lon1)]``
  with an optional leading altitude ``[0]`` first-slice
  (src/data_wrangler.py:389-551).
- NRT: single URL over the trailing 7-day window (src/data_wrangler.py:738-743).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

ISO_Z = "%Y-%m-%dT%H:%M:%SZ"


def iso_z(t: datetime) -> str:
    return t.strftime(ISO_Z)


def _q(term: str) -> str:
    """Percent-encode one query-string value (spaces become '+')."""
    from urllib.parse import quote_plus

    return quote_plus(term)


@dataclass(frozen=True)
class TimeRange:
    start: datetime
    end: datetime


#: tabledap server-side grouped reductions (ERDDAP protocol; Spark-side
#: equivalents live in operators/orderby.py)
ORDERBY_KINDS = frozenset(
    {
        "orderBy",
        "orderByDescending",
        "orderByClosest",
        "orderByCount",
        "orderByLimit",
        "orderByMax",
        "orderByMin",
        "orderByMinMax",
        "orderByMean",
        "orderBySum",
    }
)


def orderby_clause(kind: str, args: list[str]) -> str:
    """Compile one ``&orderBy*("a,b,...")`` tabledap clause.

    ERDDAP takes the argument list as ONE quoted, comma-separated string;
    the quotes and commas are percent-encoded like every other query-string
    token this compiler emits (``"`` -> %22, ``,`` -> %2C). ``args`` may
    end with the variant-specific tail ERDDAP expects — a count for
    ``orderByLimit`` ("10"), a ``col/interval`` for ``orderByClosest``
    ("time/6hours").
    """
    if kind not in ORDERBY_KINDS:
        raise ValueError(f"unknown orderBy variant {kind!r}")
    if not args:
        raise ValueError(f"{kind} needs at least one argument")
    body = "%2C".join(_q(a) for a in args)
    return f"&{kind}(%22{body}%22)"


def tabledap_url(
    server: str,
    dataset_id: str,
    columns: list[str],
    time_range: TimeRange | None = None,
    response: str = "csvp",
    time_col: str = "time",
    order_by: tuple[str, list[str]] | None = None,
    end_exclusive: bool = False,
) -> str:
    """Compile projection + time predicate into a tabledap query URL.
    ``end_exclusive=True`` emits ``time<end`` instead of ``time<=end`` —
    the half-open form chunked scans need (see tabledap_chunk_urls)."""
    cols = [c for c in columns if c != time_col]
    # depth is projected first when present (reference data_wrangler.py:334-337)
    if "depth" in cols:
        cols = ["depth"] + [c for c in cols if c != "depth"]
    projection = "%2C".join([time_col] + cols)
    url = f"{server.rstrip('/')}/tabledap/{dataset_id}.{response}?{projection}"
    if time_range is not None:
        end_op = "%3C" if end_exclusive else "%3C%3D"
        url += (
            f"&{time_col}%3E%3D{iso_z(time_range.start)}"
            f"&{time_col}{end_op}{iso_z(time_range.end)}"
        )
    if order_by is not None:
        url += orderby_clause(order_by[0], order_by[1])
    return url


def tabledap_chunk_urls(
    server: str,
    dataset_id: str,
    columns: list[str],
    chunks: list[TimeRange],
    response: str = "csvp",
) -> list[str]:
    """One URL per time slice — these become the scan's input partitions
    (one Spark task per chunk, SURVEY §2.1 S6).

    A chunk gets an EXCLUSIVE upper bound (``time<e``) exactly when
    ANOTHER chunk starts at its endpoint: two closed ranges sharing a
    boundary would both fetch a row landing exactly on it — duplicating
    it in the union and breaking the connector's union-of-partitions ==
    whole-dataset contract (review r5). Keying on continuation (not list
    position) keeps the rule correct for unsorted or descending chunk
    lists AND leaves genuinely disjoint windows fully closed, so a row
    on a lone window's edge is never dropped. (The reference emits
    closed bounds on every subset URL — data_wrangler.py:322-387 — and
    carries the boundary double-count hazard; this is a deliberate
    correctness deviation, not a parity miss.)
    """
    starts = {iso_z(c.start) for c in chunks}
    return [
        tabledap_url(
            server, dataset_id, columns, chunk, response,
            end_exclusive=(iso_z(chunk.end) in starts),
        )
        for chunk in chunks
    ]


def nrt_url(
    server: str,
    dataset_id: str,
    columns: list[str],
    now: datetime,
    window_days: int = 7,
    response: str = "csvp",
) -> str:
    """W2: the 7-day moving-window URL regenerated each refresh."""
    return tabledap_url(
        server,
        dataset_id,
        columns,
        TimeRange(now - timedelta(days=window_days), now),
        response,
    )


@dataclass(frozen=True)
class GridSelector:
    """Hyperslab selectors for one griddap request (P5)."""

    time_range: TimeRange
    lat_range: tuple[float, float]
    lon_range: tuple[float, float]
    time_stride: int = 1
    has_altitude: bool = False  # leading [0] first-slice when true
    lat_order_desc: bool = False  # some grids store latitude north->south


def griddap_url(
    server: str,
    dataset_id: str,
    variables: list[str],
    sel: GridSelector,
    response: str = "nc",
) -> str:
    """Compile hyperslab selectors into a griddap URL."""
    t0, t1 = iso_z(sel.time_range.start), iso_z(sel.time_range.end)
    lat0, lat1 = sel.lat_range
    if sel.lat_order_desc:  # grid stored north->south: selector flipped
        lat0, lat1 = lat1, lat0
    lon0, lon1 = sel.lon_range
    slabs = f"%5B({t0}):{sel.time_stride}:({t1})%5D"
    if sel.has_altitude:
        slabs += "%5B0%5D"
    slabs += f"%5B({lat0}):1:({lat1})%5D%5B({lon0}):1:({lon1})%5D"
    parts = "%2C".join(f"{v}{slabs}" for v in variables)
    return f"{server.rstrip('/')}/griddap/{dataset_id}.{response}?{parts}"


# ---------------------------------------------------------------------------
# Catalog / search URLs (S1-S3)
# ---------------------------------------------------------------------------


def all_datasets_url(server: str, items_per_page: int = 100_000) -> str:
    return (
        f"{server.rstrip('/')}/tabledap/allDatasets.json"
        f"?&itemsPerPage={items_per_page}"
    )


def search_url(
    server: str,
    keywords: list[str],
    protocol: str = "tabledap",
    items_per_page: int = 100_000,
) -> str:
    """S3: full-text catalog search (keywords AND-joined with '+').
    Each keyword is percent-encoded (quote_plus turns internal spaces
    into '+', matching the joiner) so a term containing '&', '=' or
    unicode cannot truncate or split the query string."""
    terms = "+".join(_q(k) for k in keywords)
    return (
        f"{server.rstrip('/')}/search/index.json?page=1"
        f"&itemsPerPage={items_per_page}&searchFor={terms}&protocol={protocol}"
    )


def nrt_search_url(
    server: str,
    now: datetime,
    window_days: int = 7,
    items_per_page: int = 10_000_000,
    keywords: list[str] | None = None,
    protocol: str | None = None,
) -> str:
    """S3 NRT variant: advanced search constrained to datasets with data
    inside the moving window (P11).  Mirrors the reference's advanced
    query shape (core.py:117-127: optional ``searchFor`` term, empty
    ``maxTime``, ``protocol`` filter) with one deliberate difference —
    the window bound is an ABSOLUTE ISO instant instead of the server-
    evaluated ``now-{N}days`` literal, so the compiled URL is
    deterministic for a given ``now`` (testable, cache-keyable, and
    identical across retries that straddle midnight)."""
    min_time = iso_z(now - timedelta(days=window_days))
    search = f"searchFor={'+'.join(_q(k) for k in keywords)}&" if keywords else ""
    proto = f"&protocol={_q(protocol)}" if protocol else ""
    return (
        f"{server.rstrip('/')}/search/advanced.json?{search}page=1"
        f"&itemsPerPage={items_per_page}&minTime={min_time}&maxTime={proto}"
    )
