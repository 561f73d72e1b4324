"""Python DataSource WRITER for GeoJSON FeatureCollections (K2 at scale):
executor-parallel part spool, manifest commit marker, sequential
single-document assembly."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.sinks import geojson
from erddap2agol_spark.sinks.geojson_sink import GeoJSONDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(GeoJSONDataSource)
    return spark


def _features(spark, n=7):
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 1.5).alias("lon"),
        (F.col("id") * -0.5).alias("lat"),
    )
    geom = F.concat(
        F.lit('{"type":"Point","coordinates":['),
        F.col("lon").cast("string"),
        F.lit(","),
        F.col("lat").cast("string"),
        F.lit("]}"),
    )
    return geojson.features_df(df, ["id"], geom).repartition(3)


def test_writer_roundtrip_and_manifest(registered, tmp_path):
    path = str(tmp_path / "fc")
    _features(registered).write.format("geojson_fc").mode("append").save(path)
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["n_features"] == 7
    assert sum(p["n_features"] for p in manifest["parts"]) == 7
    doc = json.load(open(os.path.join(path, "collection.geojson")))
    assert doc["type"] == "FeatureCollection"
    assert sorted(f["properties"]["id"] for f in doc["features"]) == list(range(7))
    assert doc["features"][0]["geometry"]["type"] == "Point"


def test_writer_overwrite_and_collision(registered, tmp_path):
    path = str(tmp_path / "fc2")
    _features(registered, 3).write.format("geojson_fc").mode("append").save(path)
    # append into a non-empty target collides (this sink owns the dir)
    with pytest.raises(Exception):
        _features(registered, 3).write.format("geojson_fc").mode("append").save(path)
    _features(registered, 5).write.format("geojson_fc").mode("overwrite").save(path)
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    assert manifest["n_features"] == 5
    # no stale parts from the first write survive the overwrite
    parts = [f for f in os.listdir(path) if f.endswith(".ndjson")]
    assert sorted(parts) == sorted(p["file"] for p in manifest["parts"])


def test_writer_rejects_wrong_schema(registered, tmp_path):
    df = registered.range(3).select("id", F.col("id").cast("string").alias("s"))
    with pytest.raises(Exception, match="one string column"):
        df.write.format("geojson_fc").mode("append").save(str(tmp_path / "bad"))


def test_parts_are_valid_ndjson(registered, tmp_path):
    path = str(tmp_path / "fc3")
    _features(registered).write.format("geojson_fc").mode("append").option("assemble", "false").save(path)
    assert not os.path.exists(os.path.join(path, "collection.geojson"))
    manifest = json.load(open(os.path.join(path, "_manifest.json")))
    n = 0
    for p in manifest["parts"]:
        for line in open(os.path.join(path, p["file"])):
            json.loads(line)  # every line is one valid Feature document
            n += 1
    assert n == 7


def test_commit_sweeps_stray_attempt_files(registered, tmp_path):
    """Retried/speculative attempts leave extra part files; the committer
    sweeps anything the manifest doesn't reference (and readers use the
    manifest regardless)."""
    from erddap2agol_spark.sinks.geojson_sink import GeoJSONWriter, _PartMessage

    path = str(tmp_path / "fc_sweep")
    w = GeoJSONWriter(path, "feature", overwrite=False, assemble=True)
    # a committed part, a stray duplicate attempt, and a crashed temp
    open(os.path.join(path, "part-00000-aaaa.ndjson"), "w").write('{"a":1}\n')
    open(os.path.join(path, "part-00000-bbbb.ndjson"), "w").write('{"a":1}\n')
    open(os.path.join(path, ".part-00001-cccc.ndjson.inprogress"), "w").write("x")
    w.commit([_PartMessage(0, "part-00000-aaaa.ndjson", 1)])
    files = sorted(os.listdir(path))
    assert "part-00000-bbbb.ndjson" not in files
    assert not any(f.endswith(".inprogress") for f in files)
    doc = json.load(open(os.path.join(path, "collection.geojson")))
    assert len(doc["features"]) == 1


def test_writer_distinct_spool_and_commit_roots(registered, tmp_path):
    """The fsio seam (VERDICT r5 #4): tasks spool parts under one root,
    the committer publishes parts + collection + manifest under a
    DIFFERENT root (copied through the filesystem clients) — the final
    directory is self-contained, no single shared path namespace
    assumed."""
    import json
    import os

    spark = registered
    spool = str(tmp_path / "staging")
    final = str(tmp_path / "published")
    feats = spark.range(20).selectExpr(
        """concat('{"type":"Feature","properties":{"i":', id,
                  '},"geometry":null}') AS feature"""
    )
    (
        feats.write.format("geojson_fc")
        .mode("overwrite")
        .option("assemble", "true")
        .option("spool_path", spool)
        .save(final)
    )
    man = json.load(open(os.path.join(final, "_manifest.json")))
    assert man["n_features"] == 20
    # every manifest-listed part exists under the COMMIT root
    for p in man["parts"]:
        assert os.path.exists(os.path.join(final, p["file"]))
    doc = json.load(open(os.path.join(final, "collection.geojson")))
    assert len(doc["features"]) == 20
    assert {f["properties"]["i"] for f in doc["features"]} == set(range(20))


def test_concurrent_writers_share_a_spool_prefix_safely(registered, tmp_path):
    """Review r6: each write job owns a unique subdirectory under the
    caller's spool prefix — a second overwrite-mode write must not
    delete the first job's committed output or leave staging litter."""
    import json
    import os

    spark = registered
    spool = str(tmp_path / "staging")
    for i, final in enumerate((str(tmp_path / "outA"), str(tmp_path / "outB"))):
        feats = spark.range(5 + i).selectExpr(
            """concat('{"type":"Feature","properties":{},"geometry":null}')
               AS feature"""
        )
        (
            feats.write.format("geojson_fc").mode("overwrite")
            .option("spool_path", spool).option("assemble", "true").save(final)
        )
    a = json.load(open(os.path.join(str(tmp_path / "outA"), "_manifest.json")))
    b = json.load(open(os.path.join(str(tmp_path / "outB"), "_manifest.json")))
    assert (a["n_features"], b["n_features"]) == (5, 6)
    # job-owned staging dirs were cleaned up after commit
    assert os.listdir(spool) == []
