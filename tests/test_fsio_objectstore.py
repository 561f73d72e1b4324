"""Registered non-POSIX schemes end to end through the sinks (VERDICT
r6 #6 / ADVICE r6): the GeoJSON committer and the raster tile store run
their full write+read paths through ``ObjectStoreDirFS`` — an
object-store emulator with copy+delete rename and plain-PUT
write_atomic — resolved via ``fsio.for_path`` on BOTH the driver and
the executor Python workers (the writer ships a driver-captured
registry snapshot in its task closure, because ``register_filesystem``
is per-process)."""

from __future__ import annotations

import json

import pytest

from erddap2agol_spark.sinks import fsio
from erddap2agol_spark.sinks import geojson_sink
from erddap2agol_spark.sinks.geojson_sink import GeoJSONDataSource


@pytest.fixture()
def objstore(tmp_path):
    """A uniquely-named registered scheme backed by a local directory
    with object-store semantics; unregistered on teardown so no other
    test module sees it."""
    scheme = f"objstore{tmp_path.name.lower()}"
    store = fsio.ObjectStoreDirFS(str(tmp_path / "bucket"))
    fsio.register_filesystem(scheme, store)
    yield scheme, store
    fsio.unregister_filesystem(scheme)


def test_objectstore_fs_contract(tmp_path):
    """The emulator pins the same non-POSIX contract FsspecFS exposes:
    rename is copy+delete, create_exclusive is check-and-put,
    write_atomic is a plain per-key PUT."""
    fs = fsio.ObjectStoreDirFS(str(tmp_path / "b"))
    fs.makedirs("d")
    with fs.open("d/a.txt", "w") as f:
        f.write("hello")
    assert fs.exists("d/a.txt") and not fs.exists("d/b.txt")
    fs.rename("d/a.txt", "d/b.txt")
    assert fs.exists("d/b.txt") and not fs.exists("d/a.txt")
    fs.create_exclusive("d/lock", "x")
    with pytest.raises(FileExistsError):
        fs.create_exclusive("d/lock", "y")
    fs.write_atomic("d/lock", "z")  # plain PUT replaces
    with fs.open("d/lock") as f:
        assert f.read() == "z"
    assert sorted(fs.listdir("d")) == ["b.txt", "lock"]
    assert fs.glob("d/*.txt") == ["d/b.txt"]
    # picklable: a worker-side copy resolves the same backing directory
    import pickle

    fs2 = pickle.loads(pickle.dumps(fs))
    assert fs2.exists("d/b.txt")


def test_for_path_registry_overlay(tmp_path):
    """for_path resolves a caller-supplied snapshot even when the
    process-global registry is empty — the executor-side path."""
    store = fsio.ObjectStoreDirFS(str(tmp_path / "b"))
    snap = {"snaponly": store}
    assert "snaponly" not in fsio._REGISTRY
    fs, p = fsio.for_path("snaponly://x/y.json", registry=snap)
    assert fs is store and p == "x/y.json"
    with pytest.raises(ImportError, match="per-process"):
        fsio.for_path("snaponly://x/y.json")


def test_geojson_sink_through_registered_scheme(spark, objstore):
    """K2's cluster writer, fully through a registered non-POSIX store:
    executor tasks spool+publish parts via the registry snapshot, the
    driver commits the manifest last, and the committed layout reads
    back complete."""
    scheme, store = objstore
    # register AFTER the scheme exists: the helper bakes the current
    # fsio registry into the shipped DataSource class
    geojson_sink.register(spark)
    feats = spark.range(20).selectExpr(
        """concat('{"type":"Feature","properties":{"i":', id,
                  '},"geometry":null}') AS feature"""
    ).repartition(4)
    (
        feats.write.format("geojson_fc")
        .mode("overwrite")
        .option("assemble", "true")
        .save(f"{scheme}://fc")
    )
    with store.open("fc/_manifest.json") as f:
        man = json.load(f)
    assert man["n_features"] == 20
    for part in man["parts"]:
        assert store.exists(f"fc/{part['file']}")
    with store.open("fc/collection.geojson") as f:
        doc = json.load(f)
    assert {ft["properties"]["i"] for ft in doc["features"]} == set(range(20))
    # no staging litter: everything in the root is manifest-referenced
    names = set(store.listdir("fc"))
    assert names == {"_manifest.json", "collection.geojson"} | {
        p["file"] for p in man["parts"]
    }


def test_geojson_sink_scheme_spool_to_scheme_commit(spark, objstore):
    """Distinct staging and publish prefixes on the SAME store: tasks
    publish their completed parts executor-side (no driver byte
    funnel), commit is metadata-only, staging dir dies whole."""
    scheme, store = objstore
    # register AFTER the scheme exists: the helper bakes the current
    # fsio registry into the shipped DataSource class
    geojson_sink.register(spark)
    feats = spark.range(11).selectExpr(
        """concat('{"type":"Feature","properties":{"i":', id,
                  '},"geometry":null}') AS feature"""
    ).repartition(3)
    (
        feats.write.format("geojson_fc")
        .mode("overwrite")
        .option("assemble", "false")
        .option("spool_path", f"{scheme}://staging")
        .save(f"{scheme}://published")
    )
    with store.open("published/_manifest.json") as f:
        man = json.load(f)
    assert man["n_features"] == 11
    got = []
    for part in man["parts"]:
        with store.open(f"published/{part['file']}") as f:
            got += [json.loads(line)["properties"]["i"] for line in f]
    assert sorted(got) == list(range(11))
    # the job-owned staging subdirectory was removed at commit
    assert not store.exists("staging") or store.listdir("staging") == []


def test_raster_store_through_registered_scheme(spark, objstore):
    """K5's tile store through the same seam: executor tile writes and
    the mapInPandas readback both resolve the scheme from the shipped
    snapshot; manifest-last commit protocol holds."""
    from erddap2agol_spark.sinks import raster

    scheme, store = objstore
    rows = []
    for iy, lat in enumerate([30.0, 29.0, 28.0]):
        for ix, lon in enumerate([-95.0, -94.0, -93.0, -92.0, -91.0]):
            v = float("nan") if (iy, ix) == (1, 2) else float(iy * 10 + ix)
            rows.append(("sst", "2024-03-01", lat, lon, v))
    cells = spark.createDataFrame(
        rows, "var string, t string, lat double, lon double, value double"
    )
    root = f"{scheme}://raster"
    meta = raster.write_raster_tiles(
        cells, root, slice_cols=("t",), tile_h=2, tile_w=3
    )
    assert store.exists("raster/_raster_meta.json")
    for t in meta["tiles"]:
        assert store.exists(f"raster/{t['path']}")
    back = raster.read_raster_tiles(spark, root)
    got = {(r["lat"], r["lon"]): r["value"] for r in back.collect()}
    assert len(got) == 15
    assert got[(30.0, -95.0)] == 0.0
    assert got[(29.0, -93.0)] is None  # the NaN hole -> NULL
    assert got[(28.0, -91.0)] == 24.0


def test_unregistered_scheme_fails_with_boundary_error(spark, tmp_path):
    """A scheme registered NOWHERE (and no fsspec in this container)
    must fail with the error that names the per-process registry
    boundary, not a bare ImportError from a missing package."""
    spark.dataSource.register(GeoJSONDataSource)
    feats = spark.range(3).selectExpr(
        """concat('{"type":"Feature","properties":{},"geometry":null}')
           AS feature"""
    )
    with pytest.raises(Exception, match="per-process|register_filesystem"):
        feats.write.format("geojson_fc").mode("overwrite").save(
            "nosuchscheme://fc"
        )


def test_objectstore_key_cannot_escape_root(tmp_path):
    fs = fsio.ObjectStoreDirFS(str(tmp_path / "b"))
    with pytest.raises(ValueError, match="escapes the store root"):
        fs.open("../outside.txt", "w")
    # normal nested keys still resolve
    fs.write_atomic("a/../c.txt", "x")  # normalizes INSIDE the root
    assert fs.exists("c.txt")


def test_objectstore_glob_cannot_escape_root(tmp_path):
    """ADVICE r7: glob must apply the same root-escape guard as _p — a
    pattern with '..' must not enumerate files outside the store root."""
    outside = tmp_path / "secret.txt"
    outside.write_text("x")
    fs = fsio.ObjectStoreDirFS(str(tmp_path / "b"))
    fs.write_atomic("in.txt", "y")
    with pytest.raises(ValueError, match="escapes the store root"):
        fs.glob("../*.txt")
    # in-root patterns (including dot-folding ones) still work
    assert fs.glob("*.txt") == ["in.txt"]
    assert fs.glob("./*.txt") == ["in.txt"]
