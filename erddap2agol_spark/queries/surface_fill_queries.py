"""Driver-gradeable queries for the SURVEY §2 ids whose correctness was
pytest-only through round 6 (VERDICT r6 coverage table): S1 (server-list
scan), J2 (date-cache lookup join), J5 (layer-swap correlation), P2
(griddap dimension projection), P10/U4/F12 (exclusion-path flatten with
unique-name disambiguation), S9/S10/U5/F7/F13 (portal inventory + tag
search over cleaned tags), ST5/A1 (stale-extent clamp).  Each runs the
REAL operator and carries a DuckDB oracle so the round-8 grading window
can convert those ids from pytest-only to driver CORRECTNESS rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import register

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)
_CATALOG_A = os.path.join(_FIXTURES, "catalog", "server_a.json")
_CATALOG_B = os.path.join(_FIXTURES, "catalog", "server_b.json")


# ---------------------------------------------------------------------------
# S1 — server-LIST scan over the wire (multi-server catalog union)
# ---------------------------------------------------------------------------

_SERVER_SQL = """
    SELECT '{srv}' AS server,
           r[1] AS dataset_id, r[2] AS title,
           try_strptime(r[5], '%Y-%m-%dT%H:%M:%SZ') AS min_time,
           try_strptime(r[6], '%Y-%m-%dT%H:%M:%SZ') AS max_time
    FROM (SELECT unnest(CAST(json_extract(json, '$.table.rows')
                             AS VARCHAR[][])) AS r
          FROM read_json_objects('{path}', format='auto'))
    WHERE trim(r[3]) != '' AND r[1] != 'allDatasets'
"""

_SERVER_LIST_ORACLE = (
    _SERVER_SQL.format(srv="server_a", path=_CATALOG_A)
    + " UNION ALL "
    + _SERVER_SQL.format(srv="server_b", path=_CATALOG_B)
)


@register(
    "server_list_scan",
    oracle=_SERVER_LIST_ORACLE,
    doc="S1 end to end on the wire: the engine walks a SERVER LIST (two "
    "loopback ERDDAP endpoints), GETs each allDatasets table-JSON "
    "(erddap_url.all_datasets_url -> catalog_from_url with bounded "
    "retry), parses the wire format with case-insensitive canonical "
    "column naming and malformed-date-to-NULL bounds, applies the "
    "catalog row filters (blank-protocol rows and the allDatasets "
    "self-row dropped — reference erddap_wrangler.py:310-313, "
    "core.py getGcoosServers), and unions the per-server catalogs. "
    "The oracle re-derives the same rows with DuckDB's JSON reader "
    "over the committed fixtures.",
)
def server_list_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import catalog_datasets, catalog_from_url
    from ..sources.erddap_httpd import ErddapFixtureServer
    from ..sources.erddap_url import all_datasets_url

    srv = ErddapFixtureServer(
        raw_fixtures={
            "/erddap_a/tabledap/allDatasets.json": _CATALOG_A,
            "/erddap_b/tabledap/allDatasets.json": _CATALOG_B,
        }
    )
    base = srv.start()
    try:
        parts = []
        for name, seg in (("server_a", "erddap_a"), ("server_b", "erddap_b")):
            url = all_datasets_url(f"{base}/{seg}")
            cat = catalog_from_url(spark, url, attempts=3, timeout_s=30.0)
            parts.append(
                catalog_datasets(cat).select(
                    F.lit(name).alias("server"),
                    "dataset_id",
                    "title",
                    "min_time",
                    "max_time",
                )
            )
        out = parts[0].unionByName(parts[1])
        # the catalogs are one driver-side document each (the reference's
        # planner fetch); materialize before the server goes away
        rows = out.collect()
    finally:
        srv.stop()
    return spark.createDataFrame(rows, out.schema)


# ---------------------------------------------------------------------------
# J2 — date-cache lookup join (authoritative-value coalesce)
# ---------------------------------------------------------------------------


@register(
    "date_cache_restore",
    oracle="""
    WITH results AS (
      SELECT o_orderkey AS dataset_id,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE CAST(o_orderdate AS TIMESTAMP) END AS min_time
      FROM orders
    ),
    cache AS (
      SELECT o_orderkey AS dataset_id,
             CAST(o_orderdate + INTERVAL 1 DAY AS TIMESTAMP)
               AS cached_min_time
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT r.dataset_id,
           coalesce(c.cached_min_time, r.min_time) AS min_time
    FROM results r LEFT JOIN cache c USING (dataset_id)
    """,
    doc="J2: the reference's date-cache restore (core.py:150-155) — "
    "search results with missing/NULL time bounds are enriched by a "
    "BROADCAST left join against the authoritative date cache, and the "
    "cache value WINS whenever present (coalesce(cache, result)). "
    "Surrogate data: every third order 'lost' its date in search, every "
    "second order is cached with a shifted authoritative date, so the "
    "output exercises cache-wins, result-survives, and both-NULL rows.",
)
def date_cache_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import enrich

    o = load_table(spark, sf_dir, "orders")
    results = o.select(
        F.col("o_orderkey").alias("dataset_id"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_orderdate").cast("timestamp"))
        .alias("min_time"),
    )
    cache = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select(
            F.col("o_orderkey").alias("dataset_id"),
            F.date_add(F.col("o_orderdate"), 1)
            .cast("timestamp")
            .alias("cached_min_time"),
        )
    )
    return enrich(
        results, cache, "dataset_id",
        coalesce_cols={"min_time": "cached_min_time"},
    ).select("dataset_id", "min_time")


# ---------------------------------------------------------------------------
# J5 — layer-swap correlation (by name / by ordinal)
# ---------------------------------------------------------------------------


@register(
    "layer_swap_match",
    oracle="""
    WITH by_name AS (
      SELECT 'by_name' AS mode, o.n_name AS name,
             o.n_nationkey AS old_id, n.n_nationkey + 100 AS new_id
      FROM nation o JOIN nation n ON o.n_name = n.n_name
    ),
    olds AS (
      SELECT n_name AS name, n_nationkey AS old_id,
             row_number() OVER (ORDER BY n_name) AS ord
      FROM nation
    ),
    news AS (
      SELECT n_nationkey + 200 AS new_id,
             row_number() OVER (
               ORDER BY 'swap_' || lpad(CAST(n_nationkey AS VARCHAR), 3, '0')
             ) AS ord
      FROM nation
    )
    SELECT 'by_order' AS mode, o.name, o.old_id, n.new_id
    FROM olds o JOIN news n USING (ord)
    UNION ALL SELECT * FROM by_name
    """,
    doc="J5: the layer-swap correlation in both reference modes "
    "(OverwriteFS.py:1284-1743) — pair old/new service layers by NAME "
    "(broadcast equi-join) and by ORDINAL POSITION (byLayerOrder: "
    "row_number per side over each side's own deterministic order, "
    "joined on position — the new layers here carry unrelated "
    "swap_NNN names, so only positional pairing can match them).",
)
def layer_swap_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import match_by_name_or_ordinal

    n = load_table(spark, sf_dir, "nation")
    old = n.select(
        F.col("n_name").alias("name"), F.col("n_nationkey").alias("old_id")
    )
    new_named = n.select(
        F.col("n_name").alias("name"),
        (F.col("n_nationkey") + 100).alias("new_id"),
    )
    by_name = match_by_name_or_ordinal(old, new_named, "name").select(
        F.lit("by_name").alias("mode"),
        "name",
        "old_id",
        F.col("new_id_right").alias("new_id"),
    )
    new_renamed = n.select(
        F.concat(
            F.lit("swap_"), F.lpad(F.col("n_nationkey").cast("string"), 3, "0")
        ).alias("name"),
        (F.col("n_nationkey") + 200).alias("new_id"),
    )
    # Ordinal pairing is a GLOBAL ordering — sound ONLY because layer
    # lists are bounded by a service's layer count (the reference walks
    # an in-memory list, OverwriteFS.py byLayerOrder; dozens at most).
    # The explicit limit encodes that contract in the plan, where the
    # registry-wide global-window audit (tests/test_plans.py) can see
    # the input is driver-sized rather than corpus-sized.
    layer_cap = 10_000
    by_order = match_by_name_or_ordinal(
        old.limit(layer_cap), new_renamed.limit(layer_cap), "name", by_order=True
    ).select(
        F.lit("by_order").alias("mode"),
        "name",
        "old_id",
        F.col("new_id_right").alias("new_id"),
    )
    return by_order.unionByName(by_name)


# ---------------------------------------------------------------------------
# P2 — griddap measure-variable projection from DAS metadata
# ---------------------------------------------------------------------------


def _das_texts() -> dict[str, str]:
    das_dir = os.path.join(_FIXTURES, "das")
    out = {}
    for name in sorted(os.listdir(das_dir)):
        if name.endswith(".das"):
            with open(os.path.join(das_dir, name)) as f:
                out[name[: -len(".das")]] = f.read()
    return out


@register(
    "griddap_measure_vars",
    oracle="""
    SELECT * FROM (VALUES
      ('buoy_42', 'qartod_speed_flag'),
      ('buoy_42', 'sea_water_temperature'),
      ('buoy_42', 'station_id'),
      ('buoy_42', 'z'),
      ('ship_wteo', 'air_temperature'),
      ('ship_wteo', 'flag')
    ) AS t(dataset_id, variable)
    """,
    doc="P2: griddap MEASURE variables from parsed DAS metadata — drop "
    "dimension/bookkeeping names (latitude/longitude/time/NC_GLOBAL/"
    "altitude/zlev/depth), anything flagged by coverage_content_type "
    "(buoy_42's sea_water_temperature_qc_agg is qualityInformation), "
    "and l2_ products (reference src/das_client.py:245-296). Expected "
    "rows hand-derived from the committed fixtures, same discipline as "
    "das_schema_plan.",
)
def griddap_measure_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import das

    meta = das.das_to_dataframe(spark, _das_texts())
    return das.grid_measure_variables(meta).select("dataset_id", "variable")


# ---------------------------------------------------------------------------
# P10 + U4 + F12 — exclusion-path flatten with leaf-name disambiguation
# ---------------------------------------------------------------------------


@register(
    "flatten_exclusion_paths",
    oracle="""
    SELECT r_regionkey AS key,
           r_name AS name,
           'c_' || r_name AS name2,
           'x_' || r_name AS inner_kept
    FROM region
    """,
    doc="F12+P10+U4 composed on real rows: a doubly-nested frame is "
    "flattened with flatten_names=False — colliding leaf names get the "
    "reference's name2/name3 suffixes (U4, Json2GeoJSON unique-name "
    "loop) — while the dotted exclusion path a.inner is KEPT as a "
    "nested struct (P10); the query then reads a field THROUGH the "
    "preserved struct, which only resolves if the exclusion really "
    "short-circuited the descent.",
)
def flatten_exclusion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.convert import flatten

    r = load_table(spark, sf_dir, "region")
    nested = r.select(
        F.col("r_regionkey").alias("key"),
        F.struct(
            F.col("r_name").alias("name"),
            F.struct(
                F.concat(F.lit("x_"), F.col("r_name")).alias("name")
            ).alias("inner"),
        ).alias("a"),
        F.struct(
            F.concat(F.lit("c_"), F.col("r_name")).alias("name")
        ).alias("b"),
    )
    flat = flatten(nested, flatten_names=False, exclude=("a.inner",))
    # columns now: key, name (a.name), inner (STRUCT — excluded), name2
    # (b.name, disambiguated); prove the struct survived by reading into it
    return flat.select(
        "key", "name", "name2", F.col("inner")["name"].alias("inner_kept")
    )


# ---------------------------------------------------------------------------
# S9/S10 + U5 + F7 + F13 — portal inventory scan and tag search
# ---------------------------------------------------------------------------


@register(
    "portal_inventory_tags",
    oracle="""
    SELECT regexp_replace('Layer ' || r_name, '[^A-Za-z0-9_-]', '_', 'g')
             AS item_id,
           CAST(3 AS BIGINT) AS n_tags,
           (r_regionkey % 2 = 0) AS has_shared
    FROM region
    """,
    doc="S9/S10 over the model portal: items are published with NESTED, "
    "duplicated tag lists (F13 flatten + U5 order-preserving dedup "
    "inside publish), titles pass the F7 sanitize (space -> _), and "
    "the inventory is then scanned two ways — full listing with per-"
    "item tag counts, and a TAG SEARCH for the shared tag (reference "
    "agol_wrangler.py content search + tag filters). The oracle "
    "re-derives the sanitized ids and membership in SQL over region.",
)
def portal_inventory_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sinks.publish import (
        ItemProperties,
        item_properties,
        publish,
        search_items,
    )

    r = load_table(spark, sf_dir, "region")
    portal = tempfile.mkdtemp(prefix="e2a_portal_inv_")
    payload = r.select("r_regionkey", "r_name")
    for row in sorted(r.collect(), key=lambda x: x["r_regionkey"]):
        tags = [
            ["gcoos", row["r_name"]],  # nested list -> F13 flatten
            "gcoos",  # duplicate -> U5 dedup
            "shared" if row["r_regionkey"] % 2 == 0 else f"only_{row['r_regionkey']}",
        ]
        publish(
            payload.filter(F.col("r_regionkey") == row["r_regionkey"]),
            portal,
            ItemProperties(title=f"Layer {row['r_name']}", tags=tags),
        )
    shared = set(search_items(portal, "shared"))  # S10 tag search
    inventory = sorted(
        item_id
        for item_id in os.listdir(portal)
        if os.path.isdir(os.path.join(portal, item_id))
    )  # S9 inventory scan
    rows = [
        (item_id, len(item_properties(portal, item_id)["tags"]), item_id in shared)
        for item_id in inventory
    ]
    return spark.createDataFrame(
        rows, "item_id string, n_tags bigint, has_shared boolean"
    )


# ---------------------------------------------------------------------------
# ST5 + A1 — stale/late extent handling: future end clamped to "now"
# ---------------------------------------------------------------------------


@register(
    "stale_extent_clamp",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
      UNION ALL
      SELECT 'click', TIMESTAMP '2099-01-01 00:00:00'
      UNION ALL
      SELECT 'error', TIMESTAMP '2031-06-15 12:00:00'
    )
    SELECT event_type,
           min(ts) AS min_time,
           least(max(ts), TIMESTAMP '2024-06-01 00:00:00') AS max_time
    FROM ev GROUP BY event_type
    """,
    doc="ST5+A1: per-group time extents where upstream rows carry BOGUS "
    "future event times (a year-2099 click, a 2031 error — the stale/"
    "late-metadata shapes the reference clamps in "
    "src/das_client.py:195-204): the max is clamped to 'now' while the "
    "min and every honest group pass through untouched.",
)
def stale_extent_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import time_extent

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    bogus = ev.sparkSession.createDataFrame(
        [
            ("click", "2099-01-01 00:00:00"),
            ("error", "2031-06-15 12:00:00"),
        ],
        "event_type string, ts_s string",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    return time_extent(
        ev.unionByName(bogus),
        "ts",
        by=("event_type",),
        clamp_end_to="2024-06-01 00:00:00",
    )


# ---------------------------------------------------------------------------
# K7 + K10 + K11 — A/B swap wiring and file-item overwrite
# ---------------------------------------------------------------------------


@register(
    "ab_swap_cycles",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'data_a', (SELECT count(*) FROM region)),
      (2, 'data_b', (SELECT count(*) FROM nation)),
      (3, 'data_a', (SELECT count(*) FROM nation WHERE n_regionkey = 0))
    ) AS t(cycle, side, n_rows)
    """,
    doc="K7+K10+K11 composed: three atomic_overwrite cycles publish "
    "ARBITRARY frames (region, nation, a filtered nation — the "
    "reference's file-item overwrite takes whatever the converter "
    "produced, OverwriteFS.py overwrite path) into one A/B sink. The "
    "pointer sidecar must alternate data_a -> data_b -> data_a (the "
    "item->data relationship wiring, K10), read_current must resolve "
    "every cycle's snapshot through the pointer only, and the PREVIOUS "
    "side must stay intact until its successor commits (readers never "
    "see a partial write). Counts graded cross-engine per cycle.",
)
def ab_swap_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.nrt import atomic_overwrite, current_data_dir, read_current

    sink = tempfile.mkdtemp(prefix="e2a_ab_swap_")
    frames = [
        load_table(spark, sf_dir, "region").select("r_regionkey", "r_name"),
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select("n_nationkey", "n_name"),
    ]
    rows = []
    for i, frame in enumerate(frames, start=1):
        before = current_data_dir(sink)
        target = atomic_overwrite(frame, sink)
        side = os.path.basename(target)
        if before is not None and before == target:
            raise AssertionError(
                "atomic_overwrite reused the LIVE side — a reader mid-scan "
                f"would have seen a partial write ({before})"
            )
        n = read_current(spark, sink).count()  # resolves via the pointer
        rows.append((i, side, n))
    return spark.createDataFrame(rows, "cycle int, side string, n_rows bigint")


@register(
    "swap_dependency_gate",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'overwrite_fresh',            'committed',               1,
         (SELECT count(*) FROM region)),
      (2, 'overwrite_view_current',     'committed',               2,
         (SELECT count(*) FROM nation)),
      (3, 'overwrite_view_stale',       'refused:view-stale',      2,
         (SELECT count(*) FROM nation)),
      (4, 'overwrite_after_touch',      'committed',               3,
         (SELECT count(*) FROM nation WHERE n_regionkey = 0)),
      (5, 'overwrite_wfs_dependent',    'refused:wfs-dependent',   3,
         (SELECT count(*) FROM nation WHERE n_regionkey = 0)),
      (6, 'overwrite_change_tracking',  'refused:change-tracking', 3,
         (SELECT count(*) FROM nation WHERE n_regionkey = 0)),
      (7, 'overwrite_after_unregister', 'committed',               4,
         (SELECT count(*) FROM supplier))
    ) AS t(step, action, outcome, head_version, n_rows)
    """,
    doc="K6's last uncovered OverwriteFS semantic (VERDICT r8 #8): the "
    "PRE-OVERWRITE dependency verification gate "
    "(OverwriteFS.py:2041-2106). A snapshot table takes overwrites "
    "only while no registered dependent view objects: a plain view "
    "must have acknowledged (touch_view) the current head, a "
    "change-tracking-enabled view refuses outright "
    "(hasChangeTrackingEnabledViews), and a dependent WFS-kind view "
    "refuses outright. Seven cycles drive every gate arm; after each "
    "cycle the head version and the CURRENT data's row count are "
    "graded cross-engine — a refused overwrite must leave both version "
    "and data untouched.",
)
def swap_dependency_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..plans import snapshots as snap

    root = tempfile.mkdtemp(prefix="e2a_swap_gate_")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation_r0 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select("n_nationkey", "n_name")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    rows = []

    def record(step: int, action: str, frame) -> None:
        try:
            snap.overwrite(frame, root)
            outcome = "committed"
        except snap.OverwriteBlocked as e:
            outcome = "refused:" + (
                "wfs-dependent"
                if "WFS" in e.reasons[0]
                else "change-tracking"
                if "change tracking" in e.reasons[0]
                else "view-stale"
            )
        head = snap.current_version(root) or 0
        n = snap.read(spark, root).count()
        rows.append((step, action, outcome, head, n))

    record(1, "overwrite_fresh", region)               # no views: commits v1
    snap.register_view(root, "dash")                   # plain view, acked v1
    record(2, "overwrite_view_current", nation)        # view current: v2
    record(3, "overwrite_view_stale", nation_r0)       # view lags v2: refused
    snap.touch_view(root, "dash")                      # view absorbs v2
    record(4, "overwrite_after_touch", nation_r0)      # commits v3
    snap.touch_view(root, "dash")
    snap.register_view(root, "wfs_feed", kind="wfs")
    record(5, "overwrite_wfs_dependent", supplier)     # WFS dependent: refused
    snap.unregister_view(root, "wfs_feed")
    snap.register_view(root, "audit", change_tracking=True)
    record(6, "overwrite_change_tracking", supplier)   # change tracking: refused
    snap.unregister_view(root, "audit")
    record(7, "overwrite_after_unregister", supplier)  # commits v4
    return spark.createDataFrame(
        rows, "step int, action string, outcome string, head_version int, n_rows bigint"
    )


# ---------------------------------------------------------------------------
# F4 + W4 + S5 — time-delta chunk arithmetic, cross-engine
# ---------------------------------------------------------------------------

_CHUNK_CASES = [
    # (case_id, start_iso, end_iso, row_count)  chunk_size stays 100k;
    # durations divide evenly by ceil(rows/100k) so the boundary
    # arithmetic is exact in both engines' numeric models
    ("uniform_4", "2024-01-01 00:00:00", "2024-01-11 00:00:00", 350_001),
    ("single", "2024-03-01 00:00:00", "2024-03-02 00:00:00", 5),
    ("neg_epoch_7", "1950-01-01 00:00:00", "1950-01-15 00:00:00", 700_000),
    ("subday_3", "2024-06-01 00:00:00", "2024-06-01 00:00:09", 201_000),
]

_CHUNK_MATRIX_ORACLE = """
WITH cases(case_id, s, e, k) AS (VALUES
  ('uniform_4', TIMESTAMP '2024-01-01 00:00:00',
                TIMESTAMP '2024-01-11 00:00:00', 4),
  ('single', TIMESTAMP '2024-03-01 00:00:00',
             TIMESTAMP '2024-03-02 00:00:00', 1),
  ('neg_epoch_7', TIMESTAMP '1950-01-01 00:00:00',
                  TIMESTAMP '1950-01-15 00:00:00', 7),
  ('subday_3', TIMESTAMP '2024-06-01 00:00:00',
               TIMESTAMP '2024-06-01 00:00:09', 3))
SELECT case_id, CAST(i AS INT) AS chunk_idx,
       make_timestamp(epoch_us(s) + (epoch_us(e) - epoch_us(s)) * i // k)
         AS chunk_start,
       make_timestamp(epoch_us(s) + (epoch_us(e) - epoch_us(s)) * (i + 1) // k)
         AS chunk_end
FROM cases, generate_series(0, 6) AS g(i)
WHERE i < k
"""


@register(
    "chunk_delta_matrix",
    oracle=_CHUNK_MATRIX_ORACLE,
    doc="F4+W4+S5 composed, graded cross-engine: the sizing probe's "
    "row_count drives n_chunks (ceil(rows/chunk_size)) and the planner "
    "cuts equal-duration time slices with timedelta arithmetic "
    "(plans/chunking.time_slices — the reference's uniform-rate chunk "
    "plan, data_wrangler.py chunk loop). The oracle recomputes every "
    "boundary in DuckDB with integer microsecond arithmetic over a "
    "matrix that includes a pre-1970 (negative-epoch) window, a "
    "single-chunk case, and a sub-day window; the final slice must "
    "clamp exactly to the window end.",
)
def chunk_delta_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import datetime

    from ..plans.chunking import time_slices

    rows = []
    for case_id, s, e, row_count in _CHUNK_CASES:
        slices = time_slices(
            datetime.fromisoformat(s), datetime.fromisoformat(e), row_count
        )
        for i, sl in enumerate(slices):
            rows.append((case_id, i, sl.start, sl.end))
    return spark.createDataFrame(
        rows,
        "case_id string, chunk_idx int, chunk_start timestamp, "
        "chunk_end timestamp",
    )


# ---------------------------------------------------------------------------
# T1 — deterministic output field order (flatten DFS + disambiguation)
# ---------------------------------------------------------------------------


@register(
    "flatten_field_order",
    oracle="""
    SELECT * FROM (VALUES
      (0, 'key'), (1, 'name'), (2, 'inner'), (3, 'name2')
    ) AS t(ordinal, column_name)
    """,
    doc="T1: the converter's OUTPUT FIELD ORDER is part of its contract "
    "(the reference emits a deterministic field list per document; "
    "Json2GeoJSON builds its field table in traversal order) — flatten "
    "walks the schema depth-first, exclusion paths hold their "
    "position as the preserved struct, and a disambiguated collision "
    "(name2) sits where the colliding leaf was encountered. The column "
    "ORDER itself is the graded output (emitted as ordinal rows, since "
    "the driver's hash compare sorts columns by name and cannot see "
    "ordering directly).",
)
def flatten_field_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.convert import flatten

    r = load_table(spark, sf_dir, "region")
    nested = r.select(
        F.col("r_regionkey").alias("key"),
        F.struct(
            F.col("r_name").alias("name"),
            F.struct(
                F.concat(F.lit("x_"), F.col("r_name")).alias("name")
            ).alias("inner"),
        ).alias("a"),
        F.struct(
            F.concat(F.lit("c_"), F.col("r_name")).alias("name")
        ).alias("b"),
    )
    flat = flatten(nested, flatten_names=False, exclude=("a.inner",))
    return spark.createDataFrame(
        list(enumerate(flat.columns)), "ordinal int, column_name string"
    )
