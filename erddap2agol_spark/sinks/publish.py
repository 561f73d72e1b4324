"""Publish sink: the AGOL hosted-layer analog (SURVEY §2.2 K3/K4/K6,
§2.8 F18, §2.7 U5).

The reference uploads files to ArcGIS Online and wraps publish/overwrite
in retries, 409 renames, and property backup/restore. The Spark-first
analog is a local "portal": each published item is an atomic A/B-swapped
parquet snapshot (streaming.nrt.atomic_overwrite) plus an item-properties
JSON sidecar composed from dataset metadata — same observable contract
(properties survive overwrite; readers never see partials) with the
non-atomic machinery deleted. A real AGOL connector would implement the
same interface against the REST API.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..streaming.nrt import atomic_overwrite, read_current

#: tags the reference strips from auto-tagging (agol_wrangler.py:204-222)
DROP_TAGS = frozenset({"latitude", "longitude", "nc_global", "mask"})


@dataclass
class ItemProperties:
    """F18: item metadata composed from NC_GLOBAL attributes
    (makeItemProperties, agol_wrangler.py:113-197)."""

    title: str
    snippet: str = ""
    description: str = ""
    license_info: str = ""
    tags: list[str] = field(default_factory=list)
    item_type: str = "parquet"


def sanitize_item_name(name: str) -> str:
    """F7 on item names: ``[^A-Za-z0-9_-] -> _``."""
    return re.sub(r"[^A-Za-z0-9_\-]", "_", name)


def flatten_tags(tags) -> list[str]:
    """F13: recursively flatten nested tag lists."""
    out: list[str] = []
    stack = list(tags)[::-1]
    while stack:
        t = stack.pop()
        if isinstance(t, (list, tuple)):
            stack.extend(reversed(t))
        elif t is not None:
            out.append(str(t))
    return out


def clean_tags(tags, extra: list[str] | None = None) -> list[str]:
    """U5: flatten, dedupe (order-preserving), drop reserved tags."""
    seen: set[str] = set()
    out: list[str] = []
    for t in flatten_tags(tags) + (extra or []):
        if t.lower() in DROP_TAGS or t in seen or not t:
            continue
        seen.add(t)
        out.append(t)
    return out


def item_properties_from_metadata(
    meta_rows: dict[str, str], dataset_id: str, nrt: bool = False
) -> ItemProperties:
    """F18: title/snippet/description from NC_GLOBAL with the reference's
    fallback chain (summary -> project -> institution; license verbatim)."""
    title = meta_rows.get("title") or dataset_id
    summary = meta_rows.get("summary") or meta_rows.get("project") or ""
    institution = meta_rows.get("institution", "")
    snippet = (summary or institution)[:250]
    tags = clean_tags(
        ["erddap2agol_spark", dataset_id] + (["e2a_nrt"] if nrt else []),
        extra=[t.strip() for t in meta_rows.get("keywords", "").split(",") if t.strip()],
    )
    return ItemProperties(
        title=title,
        snippet=snippet,
        description=summary or f"Data from {institution or 'ERDDAP'}",
        license_info=meta_rows.get("license", ""),
        tags=tags,
    )


# ---------------------------------------------------------------------------
# The portal
# ---------------------------------------------------------------------------


def _props_path(portal_dir: str, item_id: str) -> str:
    return os.path.join(portal_dir, item_id, "_item_properties.json")


def publish(
    df: DataFrame, portal_dir: str, props: ItemProperties, overwrite: bool = False
) -> str:
    """K3/K6: publish (or overwrite) an item. Returns the item id.
    Name collisions append ``_2``, ``_3``… (the 409-rename loop, reduced
    to a directory probe). Overwrite preserves the existing properties
    sidecar — the observable contract of K8's backup/restore."""
    base = sanitize_item_name(props.title)
    item_id = base
    if not overwrite:
        n = 1
        while os.path.exists(os.path.join(portal_dir, item_id)):
            n += 1
            item_id = f"{base}_{n}"
    item_dir = os.path.join(portal_dir, item_id)
    existing_props = None
    if overwrite and os.path.exists(_props_path(portal_dir, item_id)):
        with open(_props_path(portal_dir, item_id)) as f:
            existing_props = json.load(f)
    atomic_overwrite(df, item_dir)
    os.makedirs(item_dir, exist_ok=True)
    with open(_props_path(portal_dir, item_id), "w") as f:
        json.dump(existing_props or asdict(props), f, indent=1)
    return item_id


def append(df: DataFrame, portal_dir: str, item_id: str) -> None:
    """K4: append a chunk to a published item — union-by-name with the
    current snapshot, republished atomically (Spark makes incremental
    append unnecessary for correctness; this keeps the API parity)."""
    spark = df.sparkSession
    current = read_current(spark, os.path.join(portal_dir, item_id))
    atomic_overwrite(current.unionByName(df), os.path.join(portal_dir, item_id))


def read_item(spark: SparkSession, portal_dir: str, item_id: str) -> DataFrame:
    return read_current(spark, os.path.join(portal_dir, item_id))


def item_properties(portal_dir: str, item_id: str) -> dict:
    with open(_props_path(portal_dir, item_id)) as f:
        return json.load(f)


def search_items(portal_dir: str, tag: str) -> list[str]:
    """S9/S10: inventory scan by tag over the portal's sidecars."""
    out = []
    if not os.path.isdir(portal_dir):
        return out
    for item_id in sorted(os.listdir(portal_dir)):
        p = _props_path(portal_dir, item_id)
        if os.path.exists(p):
            with open(p) as f:
                if tag in json.load(f).get("tags", []):
                    out.append(item_id)
    return out
