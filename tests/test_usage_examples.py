"""USAGE.md cannot rot: extract its ```python blocks and execute them
verbatim against the test tables."""

from __future__ import annotations

import json
import os
import re

import pytest

_DOC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "USAGE.md")


def _blocks() -> list[str]:
    text = open(_DOC).read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_usage_doc_has_nine_pipelines():
    assert len(_blocks()) == 9


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 4, 5, 6, 7, 8])
def test_usage_block_runs_verbatim(spark, tmp_path, idx):
    block = _blocks()[idx]
    env = {
        "spark": spark,
        "SF": "/root/testdata/sf0.001",
        "OUT_DIR": str(tmp_path / f"usage_out_{idx}"),
    }
    exec(compile(block, f"USAGE.md[block {idx}]", "exec"), env)
    if idx == 0:
        # the GeoJSON pipeline must have committed a valid collection
        doc = json.load(open(os.path.join(env["OUT_DIR"], "collection.geojson")))
        assert doc["type"] == "FeatureCollection" and doc["features"]
    elif idx == 1:
        assert env["n_rows"] > 0
        assert env["stats"]["rows_in"] >= env["stats"]["rows_kept"]
    elif idx == 2:
        # the HTTP pipeline published once then skipped on 304; its own
        # asserts inside the block are the contract, plus the snapshot
        # must be readable
        from erddap2agol_spark.streaming import nrt

        assert nrt.read_current(spark, env["OUT_DIR"] + "/nrt").count() == 40
    elif idx == 3:
        # multimodal/raster/portal block: the raster store committed
        import json as _json

        meta = _json.load(
            open(os.path.join(env["OUT_DIR"] + "/tiles", "_raster_meta.json"))
        )
        assert meta["wkid"] == 4326 and meta["tiles"]
    elif idx == 4:
        # object-store + streaming block: manifest committed through the
        # registered scheme; the block's own asserts pin exactly-once
        import json as _json

        man = _json.load(
            open(os.path.join(env["OUT_DIR"], "bucket", "published", "_manifest.json"))
        )
        assert man["n_features"] == 12
    elif idx == 5:
        # snapshot gate + checkpoint lifecycle block: the refusal fired
        # with a stale-view reason and the explicit release freed blocks
        assert any("stale" in r for r in env["gate_reasons"])
        assert env["n_freed"] >= 1
    elif idx == 6:
        # tokenizer lifecycle block: eight merges learned, monotone
        # compression curve, merged units in the vocabulary head
        assert len(env["merges"]) == 8
        assert env["curve"] == sorted(env["curve"], reverse=True)
    elif idx == 7:
        # boilerplate + graph block: its own asserts pin doc retention
        # and the hub ordering; the collect must have materialized
        assert len(env["top"]) == 5
    else:
        # legacy Rss2Json block: gate passed, config round-tripped, and
        # the field pipeline produced all items x configured fields
        assert len(env["fields"]) == 8
        assert env["tallies"][("unused", "category")] == 1
