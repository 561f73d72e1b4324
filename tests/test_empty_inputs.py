"""Zero-row robustness contract: EVERY registered query must execute
against schema-identical EMPTY tables — returning zero (or constant)
rows, never raising. At 100 TB, an empty slice is not an edge case: a
partition filter, a date range, or a tenant with no data produces
exactly this shape mid-pipeline. Exception carve-out: unsupervised fits
(ann_ivf's KMeans quantizer) REQUIRE data and raise a documented
ValueError — anything else that throws is a bug (this sweep found three:
a numpy axis error in the matrix ANN's empty query set, the KMeans
py4j error surfacing raw, and the connector's footer planner dying on
zero-row-group files)."""

from __future__ import annotations

import os

import pytest

from erddap2agol_spark.queries import REGISTRY, _load_all
from erddap2agol_spark.sources.tables import TABLE_NAMES

_load_all()


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLE_NAMES:
        spark.read.parquet(os.path.join(src, f"{t}.parquet")).limit(0) \
            .write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


def test_every_query_survives_empty_tables(spark, empty_sf):
    fails = []
    for name, spec in sorted(REGISTRY.items()):
        try:
            spec.spark(spark, empty_sf).count()
        except ValueError as e:
            # the one documented data-required contract
            if "non-empty corpus" not in str(e):
                fails.append((name, f"ValueError: {e}"))
        except Exception as e:  # noqa: BLE001 — this test IS the catch-all
            fails.append((name, str(e).splitlines()[0][:160]))
    assert not fails, fails
