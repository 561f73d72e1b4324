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


def test_usage_doc_has_two_pipelines():
    assert len(_blocks()) == 2


@pytest.mark.parametrize("idx", [0, 1])
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
    else:
        assert env["n_rows"] > 0
        assert env["stats"]["rows_in"] >= env["stats"]["rows_kept"]
