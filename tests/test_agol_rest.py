"""ArcGIS-REST publish transport (K3/K6/K8/K11 + S9/S10 over the wire)
against the loopback portal simulator — the reference's postAndPublish /
OverwriteFS flows as three-call REST semantics."""

from __future__ import annotations

import pytest

from erddap2agol_spark.sinks.agol_httpd import AgolFixturePortal
from erddap2agol_spark.sinks.agol_rest import (
    AgolHttpError,
    AgolRestClient,
    publish_df,
    read_service,
)
from erddap2agol_spark.sinks.publish import ItemProperties


@pytest.fixture()
def portal():
    p = AgolFixturePortal()
    base = p.start()
    yield p, AgolRestClient(base)
    p.stop()


def _props(title="Buoy Layer"):
    return ItemProperties(
        title=title, snippet="snip", description="d",
        license_info="Public domain", tags=["e2a_test", "buoy_42"],
    )


def test_publish_roundtrip_and_paged_readback(spark, portal):
    _, client = portal
    df = spark.range(23).selectExpr("id AS k", "id * 2 AS v")
    item_id, svc = publish_df(df, client, _props())
    back = read_service(spark, client, svc, "k long, v long", page_size=7)
    rows = {(r.k, r.v) for r in back.collect()}
    assert rows == {(i, 2 * i) for i in range(23)}
    # paging really happened: ceil(23/7) = 4 query pages
    p = portal[0]
    assert sum("resultOffset" in r for r in p.request_log) >= 4


def test_409_collision_renames_like_the_reference(spark, portal):
    _, client = portal
    df = spark.range(3).selectExpr("id AS k")
    i1, _ = publish_df(df, client, _props())
    i2, _ = publish_df(df, client, _props())
    i3, _ = publish_df(df, client, _props())
    titles = {client.item_properties(i)["title"] for i in (i1, i2, i3)}
    assert titles == {"Buoy Layer", "Buoy Layer_2", "Buoy Layer_3"}


def test_overwrite_replaces_data_preserves_properties(spark, portal):
    """The K6+K8 observable contract over the wire: overwrite swaps the
    service's DATA but the item's properties survive (backup -> update
    -> restore), even when the overwrite carries different metadata."""
    _, client = portal
    first = spark.range(10).selectExpr("id AS k")
    item_id, svc = publish_df(first, client, _props())
    changed = ItemProperties(
        title="Buoy Layer", snippet="SHOULD NOT APPEAR",
        tags=["e2a_test", "buoy_42"],
    )
    second = spark.range(4).selectExpr("id + 100 AS k")
    item2, svc2 = publish_df(second, client, changed, overwrite=True)
    assert (item2, svc2) == (item_id, svc)
    back = read_service(spark, client, svc, "k long")
    assert sorted(r.k for r in back.collect()) == [100, 101, 102, 103]
    props = client.item_properties(item_id)
    assert props["snippet"] == "snip"  # original properties restored
    assert props["licenseInfo"] == "Public domain"


def test_tag_search_inventory(spark, portal):
    _, client = portal
    df = spark.range(2).selectExpr("id AS k")
    i1, _ = publish_df(df, client, _props("Layer A"))
    publish_df(df, client, ItemProperties(title="Other", tags=["misc"]))
    hits = client.search("e2a_test")
    assert [h["id"] for h in hits] == [i1]


def test_payload_limit_guards_bulk_data(spark, portal):
    _, client = portal
    df = spark.range(50).selectExpr("id AS k")
    with pytest.raises(ValueError, match="payload exceeds"):
        publish_df(df, client, _props("Big"), payload_limit=10)


def test_http_errors_surface_with_code(spark, portal):
    _, client = portal
    with pytest.raises(AgolHttpError) as e:
        client.publish("no-such-item")
    assert e.value.code == 404
