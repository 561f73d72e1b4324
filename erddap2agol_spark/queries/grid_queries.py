"""Griddap binary-ingestion queries (SURVEY §2.1 S7 — the physical
path).

The reference spools griddap responses as real NetCDF bytes
(src/data_wrangler.py:592-604) and decodes them with xarray
(src/agol_wrangler.py:235-261).  Here the spool is a deterministic
synthetic fixture (``sources/griddap_fixture.py``), Spark reads the
BYTES through ``binaryFile`` + ``mapInPandas``
(``sources/netcdf.read_griddap_netcdf``), and the DuckDB oracle reads an
independently-computed long-form parquet TRUTH — so a green hash match
proves the binary decode itself, not just the aggregation on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import grid
from ..sources.griddap_fixture import FIXTURE_ROOT, ensure_griddap_fixture
from ..sources.netcdf import read_griddap_netcdf
from . import register

_TRUTH = f"{FIXTURE_ROOT}/grid_long_truth.parquet"


def _grid_cell_stats(cells: DataFrame) -> DataFrame:
    """Shared tail of both griddap_ingest paths: lat hyperslab ->
    per-(var, time) cell stats. Fill cells decode as NaN (the reference
    keeps them and filters later, src/erddap_wrangler.py:380-385); null
    them so avg/count treat them as missing, matching the truth
    parquet's NULLs."""
    sliced = grid.hyperslab(cells, "time", "lat", "lon", lat_range=(25.5, 29.5))
    v = F.when(F.isnan("value"), None).otherwise(F.col("value"))
    return (
        sliced.withColumn("value", v)
        .groupBy("var", "time")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.count("value").alias("n_valid"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


@register(
    "griddap_ingest",
    oracle=f"""
    SELECT var, time, count(*) AS n_cells,
           count(value) AS n_valid,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM read_parquet('{_TRUTH}')
    WHERE lat BETWEEN 25.5 AND 29.5
    GROUP BY var, time
    """,
    doc="S7 physical path: NetCDF-classic bytes (record + fixed layouts, "
    "packed shorts, fill values) -> binaryFile + mapInPandas long form -> "
    "lat hyperslab -> per-(var, time) cell stats. Oracle reads an "
    "independently-computed truth parquet, so the hash grades the binary "
    "decode end-to-end.",
)
def griddap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    return _grid_cell_stats(read_griddap_netcdf(spark, nc_dir))


@register(
    "griddap_stride",
    oracle=f"""
    WITH sliced AS (
      SELECT * FROM read_parquet('{_TRUTH}')
      WHERE lat BETWEEN 25.5 AND 29.5
    ),
    steps AS (
      SELECT time, row_number() OVER (ORDER BY time) - 1 AS step
      FROM (SELECT DISTINCT time FROM sliced)
    )
    SELECT var, t.time, count(*) AS n_cells,
           count(value) AS n_valid,
           round(avg(value), 6) AS avg_value
    FROM sliced t JOIN steps s ON t.time = s.time
    WHERE s.step % 2 = 0
    GROUP BY var, t.time
    """,
    doc="P5's stride selector ([(t0):2:(t1)]) on the decoded NetCDF "
    "grid WITHOUT a known time lattice — the rank-based fallback. The "
    "distinct time steps are numbered with the range-partitioned "
    "row-number form (operators/windows.py:_ranged_row_number — no "
    "single-partition window, VERDICT r5 #7) and the kept steps "
    "broadcast back onto the cells; the oracle computes the identical "
    "every-2nd-distinct-time selection in DuckDB over the independent "
    "truth parquet. Reference stride semantics: "
    "src/data_wrangler.py:441-480 time selector stride.",
)
def griddap_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    cells = read_griddap_netcdf(spark, nc_dir)
    sliced = grid.hyperslab(
        cells, "time", "lat", "lon", lat_range=(25.5, 29.5), time_stride=2
    )
    v = F.when(F.isnan("value"), None).otherwise(F.col("value"))
    return (
        sliced.withColumn("value", v)
        .groupBy("var", "time")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.count("value").alias("n_valid"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


_CSVP = "/root/repo/fixtures/csvp/glider_track.csvp"

_GLIDER_SEG_ORACLE = f"""
    WITH raw AS (
      SELECT "time (UTC)" AS t,
             "latitude (degrees_north)" AS lat,
             "longitude (degrees_east)" AS lon,
             "depth (m)" AS depth,
             "sea_water_temperature (degree_C)" AS temp
      FROM read_csv('{_CSVP}', header=true, nullstr='NaN')
    ),
    pts AS (
      SELECT t, lat, lon, depth, temp,
             row_number() OVER (ORDER BY t) AS rn
      FROM raw WHERE lat IS NOT NULL AND lon IS NOT NULL
    )
    SELECT a.rn AS seg_id,
           a.lon AS x1, a.lat AS y1, b.lon AS x2, b.lat AS y2,
           b.depth AS depth_end, b.temp AS temp_end
    FROM pts a JOIN pts b ON b.rn = a.rn + 1
    ORDER BY seg_id
    """


def _glider_segments(pts_src: DataFrame) -> DataFrame:
    """Shared consecutive-point segment build for both physical paths
    (file scan / HTTP scan): invalid-coordinate rows dropped BEFORE
    pairing, properties from each segment's END point, scalable row
    numbering + hash equi-join on rn+1 (no single-partition window)."""
    from ..operators.windows import with_row_number

    pts = with_row_number(
        pts_src.filter(
            F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
        ),
        ["time"],
        name="rn",
        scalable=True,
    )
    a = pts.select(
        F.col("rn").alias("seg_id"),
        F.col("longitude").alias("x1"),
        F.col("latitude").alias("y1"),
        (F.col("rn") + 1).alias("__next"),
    )
    b = pts.select(
        F.col("rn").alias("__next"),
        F.col("longitude").alias("x2"),
        F.col("latitude").alias("y2"),
        F.col("depth").alias("depth_end"),
        F.col("sea_water_temperature").alias("temp_end"),
    )
    return (
        a.join(b, "__next")
        .drop("__next")
        .select("seg_id", "x1", "y1", "x2", "y2", "depth_end", "temp_end")
        .orderBy("seg_id")
    )


@register(
    "csvp_glider_segments",
    oracle=f"""
    WITH raw AS (
      SELECT "time (UTC)" AS t,
             "latitude (degrees_north)" AS lat,
             "longitude (degrees_east)" AS lon,
             "depth (m)" AS depth,
             "sea_water_temperature (degree_C)" AS temp
      FROM read_csv('{_CSVP}', header=true, nullstr='NaN')
    ),
    pts AS (
      SELECT t, lat, lon, depth, temp,
             row_number() OVER (ORDER BY t) AS rn
      FROM raw WHERE lat IS NOT NULL AND lon IS NOT NULL
    )
    SELECT a.rn AS seg_id,
           a.lon AS x1, a.lat AS y1, b.lon AS x2, b.lat AS y2,
           b.depth AS depth_end, b.temp AS temp_end
    FROM pts a JOIN pts b ON b.rn = a.rn + 1
    ORDER BY seg_id
    """,
    doc="S6 physical path, tabledap flavor: the reference's csvp wire "
    "format (units inline in the header row, literal 'NaN' missing "
    "values — data_wrangler.py:324/609) read as a distributed csv scan "
    "with units lifted to a sidecar, then the glider consecutive-point "
    "segment build (agol_wrangler.pointTableToGeojsonLine:767-810): "
    "invalid-coordinate rows dropped BEFORE pairing, properties taken "
    "from each segment's END point. Consecutive pairing runs on the "
    "SCALABLE row-number form (range-partition + per-range offsets, "
    "operators/windows.py:_ranged_row_number) followed by a hash "
    "equi-join on rn+1 — no single-partition window anywhere, the "
    "same numbering idiom the oracle's rn-join uses in DuckDB.",
)
def csvp_glider_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.csvp import read_csvp

    df, units = read_csvp(spark, _CSVP)
    assert units["latitude"] == "degrees_north"  # header units survived
    return _glider_segments(df)


_FIXTURE_SERVER = None


def _fixture_base_url() -> str:
    """Process-lifetime loopback ERDDAP simulator serving the committed
    fixtures (sources/erddap_httpd.py): the csvp glider track as a
    tabledap dataset and the griddap spool's .nc files as raw bytes. A
    singleton because the returned DataFrames are lazy — the HTTP
    fetches run whenever the caller collects, so the server must outlive
    the query function."""
    global _FIXTURE_SERVER
    if _FIXTURE_SERVER is None:
        import glob
        import os

        from ..sources.erddap_httpd import ErddapFixtureServer

        nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
        raw = {
            f"/griddap/{os.path.basename(p)}": p
            for p in sorted(glob.glob(os.path.join(nc_dir, "*.nc")))
        }
        # the dataset's wire DAS document (griddap_e2e_raster's step 1)
        raw["/griddap/tempsal_grid.das"] = os.path.join(
            FIXTURE_ROOT, "tempsal_grid.das"
        )
        srv = ErddapFixtureServer(
            csvp_fixtures={"glider_track": _CSVP},
            raw_fixtures=raw,
            # time-division dispatch for hyperslab GETs: file 1 holds
            # hours 0-18 (record layout), file 2 hours 24-30 (fixed dims)
            grid_fixtures={
                "tempsal_grid": [
                    (
                        "2024-03-01T00:00:00Z",
                        "2024-03-01T18:00:00Z",
                        os.path.join(nc_dir, "tempsal_grid.nc"),
                    ),
                    (
                        "2024-03-02T00:00:00Z",
                        "2024-03-02T06:00:00Z",
                        os.path.join(nc_dir, "tempsal_grid_subset_2.nc"),
                    ),
                ]
            },
        )
        base = srv.start()
        _FIXTURE_SERVER = (srv, base)
    return _FIXTURE_SERVER[1]


@register(
    "csvp_glider_segments_http",
    oracle=_GLIDER_SEG_ORACLE,
    doc="S6's LIVE-HTTP physical path (VERDICT r4 #1), driver-graded end "
    "to end: tabledap_chunk_urls compiles three time-slice chunk URLs, "
    "the erddap_csvp_http Python DataSource fetches each as one SCAN "
    "TASK (per-URL timeout/retry per data_wrangler.py:556-723, csvp "
    "parsed task-side to Arrow — no row crosses the driver), against a "
    "loopback ERDDAP simulator serving the committed fixture. Downstream "
    "is the identical segment build as csvp_glider_segments, so the "
    "shared oracle proves wire-path == file-path.",
)
def csvp_glider_segments_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    from ..sources import erddap_http
    from ..sources.erddap_url import TimeRange, tabledap_chunk_urls

    base = _fixture_base_url()
    erddap_http.register(spark)
    d = dt.datetime
    chunks = [
        TimeRange(d(2024, 3, 1, 0, 0), d(2024, 3, 1, 13, 0)),
        TimeRange(d(2024, 3, 1, 13, 0), d(2024, 3, 2, 5, 0)),
        TimeRange(d(2024, 3, 2, 5, 0), d(2024, 3, 2, 20, 0)),
    ]
    cols = ["time", "latitude", "longitude", "depth", "sea_water_temperature"]
    urls = tabledap_chunk_urls(base, "glider_track", cols, chunks)
    df = (
        spark.read.format("erddap_csvp_http")
        .option("urls", "\n".join(urls))
        .option(
            "schema_ddl",
            "time timestamp_ntz, latitude double, longitude double, "
            "depth double, sea_water_temperature double",
        )
        .option("timeout_s", "30")
        .load()
    )
    return _glider_segments(df)


@register(
    "griddap_ingest_http",
    oracle=f"""
    SELECT var, time, count(*) AS n_cells,
           count(value) AS n_valid,
           round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM read_parquet('{_TRUTH}')
    WHERE lat BETWEEN 25.5 AND 29.5
    GROUP BY var, time
    """,
    doc="S7's LIVE-HTTP physical path: the griddap spool's .nc chunk "
    "URLs fetched one per SCAN TASK with bounded retry (the reference "
    "GETs each division URL and spools response.content, "
    "data_wrangler.py:592-604), bytes decoded task-side to the long "
    "grid form — never spooled to disk, never through the driver — then "
    "the identical hyperslab + cell stats as griddap_ingest. Same "
    "independent-truth oracle, so the hash grades wire fetch + binary "
    "decode end to end.",
)
def griddap_ingest_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os

    from ..sources.netcdf import read_griddap_netcdf_http

    base = _fixture_base_url()
    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    urls = [
        f"{base}/griddap/{os.path.basename(p)}"
        for p in sorted(glob.glob(os.path.join(nc_dir, "*.nc")))
    ]
    return _grid_cell_stats(read_griddap_netcdf_http(spark, urls))


_DRIFT = "/root/repo/fixtures/schema_drift"


@register(
    "schema_drift_union",
    oracle=f"""
    SELECT CAST(epoch AS INT) AS epoch,
           count(*) AS n,
           round(avg(temp), 2) AS avg_temp,
           round(avg(salinity), 2) AS avg_salinity,
           count(station) AS n_station
    FROM read_parquet('{_DRIFT}/*/*.parquet',
                      union_by_name=true, hive_partitioning=true)
    GROUP BY epoch
    ORDER BY epoch
    """,
    doc="Schema evolution across dataset epochs — the long-lived-"
    "deployment reality the reference meets when an ERDDAP dataset "
    "grows columns between harvests (its DAS re-probe picks up new "
    "attributes per run, src/das_client.py getActualAttributes): a "
    "partitioned store whose epoch=2 files carry two columns epoch=1 "
    "never had. Spark reads the whole store in ONE scan with "
    "mergeSchema (missing columns surface as NULL; partition "
    "discovery yields the epoch key, so epoch predicates become "
    "partition pruning, never file reads); the oracle is DuckDB's "
    "union_by_name read of the same files. Aggregating avg(salinity) "
    "per epoch proves the NULL-fill semantics agree cross-engine.",
)
def schema_drift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", _DRIFT)
        .parquet(_DRIFT)
    )
    return (
        store.groupBy(F.col("epoch").cast("int").alias("epoch"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("temp"), 2).alias("avg_temp"),
            F.round(F.avg("salinity"), 2).alias("avg_salinity"),
            F.count("station").alias("n_station"),
        )
        .orderBy("epoch")
    )


@register(
    "grid_bilinear_regrid",
    oracle=f"""
    WITH src AS (
      SELECT var, time, altitude,
             CAST(round((lat - 25.0) / 1.0) AS BIGINT) AS iy,
             CAST(round((lon - (-95.0)) / 1.0) AS BIGINT) AS ix,
             value AS v
      FROM read_parquet('{_TRUTH}')
    ),
    ex AS (
      SELECT var, time, altitude, iy - c.dy AS ty, ix - c.dx AS tx,
             c.w * v AS wv, v
      FROM src CROSS JOIN (
        VALUES (0, 0, 0.5625), (1, 0, 0.1875), (0, 1, 0.1875), (1, 1, 0.0625)
      ) c(dy, dx, w)
    )
    SELECT var, time, altitude,
           CAST(25.0 + (ty + 0.25) * 1.0 AS DOUBLE) AS lat,
           CAST(-95.0 + (tx + 0.25) * 1.0 AS DOUBLE) AS lon,
           round(sum(wv), 6) AS value
    FROM ex
    GROUP BY var, time, altitude, ty, tx
    HAVING count(v) = 4
    """,
    doc="Bilinear regrid onto a quarter-cell-staggered target grid, "
    "join-free: every source cell explodes to the <=4 target points it "
    "supports with constant corner weights (both grids uniform), one "
    "hash aggregate per target, count guard drops edge/fill-adjacent "
    "targets instead of extrapolating. Runs on the DECODED NetCDF bytes "
    "(binaryFile + mapInPandas) while the oracle regrids the independent "
    "truth parquet — the hash grades decode + resampling end-to-end.",
)
def grid_bilinear_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    cells = read_griddap_netcdf(spark, nc_dir)
    v = F.when(F.isnan("value"), None).otherwise(F.col("value"))
    return grid.bilinear_regrid(
        cells.withColumn("value", v),
        dims=["var", "time", "altitude"],
        lat_col="lat",
        lon_col="lon",
        value_col="value",
        lat0=25.0,
        lon0=-95.0,
        step=1.0,
        fy=0.25,
        fx=0.25,
    )


def _sigma_t_oracle() -> str:
    from ..functions.seawater import sigma_t_sql

    return f"""
    WITH wide AS (
      SELECT time, altitude, lat, lon,
             max(CASE WHEN var = 'water_temp' THEN value END) AS t,
             max(CASE WHEN var = 'salinity' THEN value END) AS s
      FROM read_parquet('{_TRUTH}')
      GROUP BY time, altitude, lat, lon
    )
    SELECT time, altitude, lat, lon,
           round({sigma_t_sql("t", "s")}, 6) AS sigma_t
    FROM wide WHERE t IS NOT NULL AND s IS NOT NULL
    """


@register(
    "grid_sigma_t",
    oracle=_sigma_t_oracle(),
    doc="Derived variable over the decoded NetCDF grid: EOS-80 seawater "
    "density anomaly sigma-t(S, T, 0) per cell. The long form pivots to "
    "(t, s) with ONE conditional aggregate (no self-join of the cell "
    "table), then the polynomial runs in whole-stage codegen. Spark and "
    "the oracle share one expression builder (functions/seawater.py) — "
    "identical Horner association, sqrt(S)*S for S^1.5 — so the floats "
    "match bit-for-bit before the 6dp round; the oracle computes from "
    "the independent truth parquet, grading decode + pivot + physics.",
)
def grid_sigma_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.seawater import sigma_t

    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    cells = read_griddap_netcdf(spark, nc_dir)
    v = F.when(F.isnan("value"), None).otherwise(F.col("value"))
    wide = (
        cells.withColumn("value", v)
        .groupBy("time", "altitude", "lat", "lon")
        .agg(
            F.max(F.when(F.col("var") == "water_temp", F.col("value"))).alias("t"),
            F.max(F.when(F.col("var") == "salinity", F.col("value"))).alias("s"),
        )
        .filter(F.col("t").isNotNull() & F.col("s").isNotNull())
    )
    return wide.select(
        "time",
        "altitude",
        "lat",
        "lon",
        F.round(sigma_t(F.col("t"), F.col("s")), 6).alias("sigma_t"),
    )


def _griddap_e2e_oracle() -> str:
    from ..functions.seawater import sigma_t_sql

    return f"""
    WITH wide AS (
      SELECT time, lat, lon,
             max(CASE WHEN var = 'water_temp' AND altitude = 0.0
                      THEN value END) AS t,
             max(CASE WHEN var = 'salinity' THEN value END) AS s
      FROM read_parquet('{_TRUTH}')
      GROUP BY time, lat, lon
    ),
    sg AS (
      -- RAW sigma, rounded only in the final stats: pre-rounding the
      -- per-cell value puts the 28-cell average exactly on 0.5e-6
      -- midpoints (k/28 = m + 1/2 for k = 28m + 14), where cross-engine
      -- summation-order ulp drift flips the 6dp round (r8 flake)
      SELECT time, lat, lon,
             CASE WHEN t IS NOT NULL AND s IS NOT NULL
                  THEN {sigma_t_sql("t", "s")} END AS sigma
      FROM wide
    )
    SELECT time, count(*) AS n_cells, count(sigma) AS n_valid,
           round(avg(sigma), 6) AS avg_sigma,
           round(min(sigma), 6) AS min_sigma,
           round(max(sigma), 6) AS max_sigma
    FROM sg GROUP BY time
    """


@register(
    "griddap_e2e_raster",
    oracle=_griddap_e2e_oracle(),
    doc="SURVEY §3.1 + K5 — the reference's GRIDDAP workflow traced end "
    "to end over real transports in one graded plan (VERDICT r7 #7, the "
    "second workflow spine next to glider_workflow_e2e): (1) the "
    "dataset's .das document fetched over the wire and parsed "
    "(das_client metadata probe), (2) measure variables + time extent + "
    "geographic range derived FROM that metadata — the hyperslab URLs "
    "use nothing hardcoded but the spool's division plan, (3) "
    "griddap_url compiles one time-division hyperslab URL per chunk "
    "(altitude [0] first-slice, north-first latitude selector flipped, "
    "data_wrangler.py:389-551), (4) the loopback ERDDAP serves each "
    "division's NetCDF bytes, decoded task-side (one URL per scan "
    "task), (5) the EOS-80 sigma-t surface layer derives via ONE "
    "conditional pivot (shared Spark/DuckDB expression builder), (6) "
    "written to the chunked raster tile store and (7) read BACK "
    "tile-by-tile (agol_wrangler.py:263-472) — the returned per-time "
    "stats come from the READBACK, so the hash grades DAS -> projection "
    "-> URL -> wire -> decode -> physics -> tile scatter -> tile gather "
    "against stats DuckDB derives from the independent truth parquet.",
)
def griddap_e2e_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt
    import tempfile

    from ..functions.seawater import sigma_t
    from ..sinks import raster
    from ..sources import das
    from ..sources.erddap_url import GridSelector, TimeRange, griddap_url
    from ..sources.netcdf import read_griddap_netcdf_http

    base = _fixture_base_url()
    # (1) wire DAS parse
    meta, failures = das.das_from_urls(
        spark, {"tempsal_grid": f"{base}/griddap/tempsal_grid.das"}
    )
    if failures:
        raise RuntimeError(f"DAS fetch failed: {failures}")
    # (2) metadata-driven projection: measure vars + extents
    mv = sorted(
        r["variable"] for r in das.grid_measure_variables(meta).collect()
    )
    assert mv == ["salinity", "water_temp"], mv
    ext = das.time_extent_from_meta(meta).first()
    geo = das.geographic_range_from_meta(meta).first()
    start, end = ext["start_time"], ext["end_time"]
    # (3) division plan (the sizing probe's output for this spool: two
    # divisions, hours 0-18 and 24-30) -> one hyperslab URL per division
    divisions = [
        TimeRange(start, start + dt.timedelta(hours=18)),
        TimeRange(start + dt.timedelta(hours=24), end),
    ]
    urls = [
        griddap_url(
            base,
            "tempsal_grid",
            mv,
            GridSelector(
                time_range=tr,
                lat_range=(geo["lat_min"], geo["lat_max"]),
                lon_range=(geo["lon_min"], geo["lon_max"]),
                has_altitude=True,       # [0] first-slice: surface layer
                lat_order_desc=True,     # grid stored north->south
            ),
        )
        for tr in divisions
    ]
    # (4) wire fetch + task-side decode
    cells = read_griddap_netcdf_http(spark, urls)
    # (5) derived surface sigma-t layer (server serves whole divisions;
    # the altitude[0] pushdown is re-applied here, exactly as Spark
    # re-applies pushed filters above a best-effort source)
    v = F.when(F.isnan("value"), None).otherwise(F.col("value"))
    wide = (
        cells.withColumn("value", v)
        .filter(
            (F.col("var") == "salinity")
            | ((F.col("var") == "water_temp") & (F.col("altitude") == 0.0))
        )
        .groupBy("time", "lat", "lon")
        .agg(
            F.max(
                F.when(F.col("var") == "water_temp", F.col("value"))
            ).alias("t"),
            F.max(F.when(F.col("var") == "salinity", F.col("value"))).alias(
                "s"
            ),
        )
        .filter(F.col("t").isNotNull() & F.col("s").isNotNull())
    )
    # RAW sigma into the tiles (the f64 tile store round-trips it
    # bit-exactly); stats round once at the end — pre-rounded 6dp cell
    # values put the per-time average exactly on 0.5e-6 midpoints,
    # where engine summation order decides the final rounded digit
    layer = wide.select(
        F.lit("sigma_t").alias("var"),
        "time",
        "lat",
        "lon",
        sigma_t(F.col("t"), F.col("s")).alias("value"),
    )
    # (6) raster tile store + (7) readback
    root = tempfile.mkdtemp(prefix="e2a_griddap_e2e_")
    raster.write_raster_tiles(
        layer, root, slice_cols=("time",), tile_h=4, tile_w=4
    )
    back = raster.read_raster_tiles(spark, root)
    return (
        back.withColumn("time", F.to_timestamp(F.col("slice")))
        .groupBy("time")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.count("value").alias("n_valid"),
            F.round(F.avg("value"), 6).alias("avg_sigma"),
            F.round(F.min("value"), 6).alias("min_sigma"),
            F.round(F.max("value"), 6).alias("max_sigma"),
        )
    )


def _noisy_lattice_fixture() -> tuple[list, str]:
    """Deterministic noisy+irregular lattice and its VALUES oracle.

    lat axis: 5 values with ~1e-8 float noise on a 0.05 step (the
    0.049999...-style steps real griddap axes carry) — noisy-UNIFORM,
    arithmetic tile indexing, explicit axes persisted for exact
    readback.  lon axis: genuinely IRREGULAR (steps 0.1/0.2/0.3) —
    index assignment via the broadcast axis join.  Two cells are
    missing and one is NaN; all three must read back as NULL.
    """
    lats = [30.0, 29.95000001, 29.9, 29.84999999, 29.8]
    lons = [-85.0, -84.9, -84.7, -84.4]
    cells, values = [], []
    for iy, lat in enumerate(lats):
        for ix, lon in enumerate(lons):
            if (iy, ix) in ((1, 3), (4, 0)):  # missing cells
                v = None
            elif (iy, ix) == (2, 2):
                v = float("nan")  # NaN -> nodata -> NULL
            else:
                v = float(iy * 10 + ix)
            if v is not None:
                cells.append(("sst", "2024-01-01", lat, lon, v))
            lit = (
                "CAST(NULL AS DOUBLE)"
                if v is None or (isinstance(v, float) and v != v)
                else f"CAST({v!r} AS DOUBLE)"
            )
            # DuckDB parses bare decimal literals as DECIMAL, which
            # normalizes differently from DOUBLE in the driver compare
            values.append(
                f"(CAST({lat!r} AS DOUBLE), CAST({lon!r} AS DOUBLE), {lit})"
            )
    oracle = (
        "SELECT * FROM (VALUES\n  "
        + ",\n  ".join(values)
        + "\n) AS t(lat, lon, value)"
    )
    return cells, oracle


_NOISY_CELLS, _NOISY_ORACLE = _noisy_lattice_fixture()


@register(
    "raster_noisy_lattice",
    oracle=_NOISY_ORACLE,
    doc="VERDICT r6 #4: the raster store on the axes real griddap "
    "grids actually have — a float-noisy uniform latitude axis "
    "(0.049999...-style steps, within AXIS_REL_TOL) and a genuinely "
    "IRREGULAR longitude axis (reference ingests any axis, "
    "agol_wrangler.py:235-261). Noisy-uniform keeps arithmetic tile "
    "indexing; irregular assigns indexes via a broadcast axis join; "
    "both persist explicit axis values in _raster_meta.json so the "
    "readback reconstructs the EXACT input coordinates (graded "
    "bit-for-bit against the hand-derived VALUES oracle, including "
    "missing and NaN cells surfacing as NULL).",
)
def raster_noisy_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sinks import raster

    cells = spark.createDataFrame(
        _NOISY_CELLS,
        "var string, time string, lat double, lon double, value double",
    )
    root = tempfile.mkdtemp(prefix="e2a_raster_noisy_")
    raster.write_raster_tiles(
        cells, root, slice_cols=("time",), tile_h=2, tile_w=3
    )
    back = raster.read_raster_tiles(spark, root)
    return back.select("lat", "lon", "value").orderBy(
        F.desc("lat"), F.asc("lon")
    )



@register(
    "raster_roundtrip",
    oracle=f"""
    SELECT var, time, count(*) AS n_cells,
           count(value) AS n_valid,
           round(avg(value), 6) AS avg_value,
           round(sum(value), 6) AS sum_value
    FROM read_parquet('{_TRUTH}')
    GROUP BY var, time
    """,
    doc="K5 closed (VERDICT r5 #5): the decoded NetCDF grid written to "
    "the chunked raster store (sinks/raster.py — per-(var, time, level) "
    "float64 tile blocks, row 0 = NORTHERNMOST latitude per the "
    "reference's lat flip, WKID 4326 + nodata in the manifest, "
    "agol_wrangler.py:235-472), then read BACK tile-by-tile to long "
    "form and aggregated per (var, time). The write shuffles once on "
    "the tile key and each applyInPandas group writes its own tile "
    "(partition-parallel, no pixel through the driver); the oracle "
    "computes the same stats from the independent truth parquet, so a "
    "hash match proves decode -> tile scatter -> nodata round-trip -> "
    "tile gather end to end.",
)
def raster_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sinks import raster

    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    cells = read_griddap_netcdf(spark, nc_dir)
    root = tempfile.mkdtemp(prefix="e2a_raster_")
    raster.write_raster_tiles(
        cells,
        root,
        var_col="var",
        slice_cols=("time", "altitude"),
        lat_col="lat",
        lon_col="lon",
        value_col="value",
        tile_h=4,
        tile_w=4,
    )
    back = raster.read_raster_tiles(spark, root)
    return (
        back.withColumn(
            "time",
            F.to_timestamp(F.split(F.col("slice"), r"\|").getItem(0)),
        )
        .groupBy("var", "time")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.count("value").alias("n_valid"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
