"""Loopback ERDDAP fixture server — the test/dev stand-in for a real
ERDDAP endpoint, so the live-HTTP physical path (``http_fetch`` +
``erddap_http``) is exercisable end to end in a sandbox with no external
network.

Serves the committed fixtures over ``http.server`` on an ephemeral
loopback port with just enough tabledap semantics for the connector:

- ``GET /tabledap/<dataset_id>.csvp?<proj>&time>=A&time<=B`` — the
  registered csvp fixture, column-projected and row-filtered by the
  time constraints, in the same wire format (one ``name (units)``
  header row, literal ``NaN`` missing values). This is what makes the
  chunked scan REAL: two different chunk URLs return two different row
  sets, so union-of-partitions == whole-dataset is a meaningful check.
- ``GET <path>`` for registered raw fixtures (griddap NetCDF bytes).
- failure injection (``fail_next``: the next N matching requests return
  an HTTP error; ``delay``: matching requests sleep first) to drive the
  timeout/retry/requeue paths the reference implements against real
  flaky servers (data_wrangler.py:556-723).

NOT a production component: real deployments point the connector at an
actual ERDDAP server; this class only reproduces the protocol surface
the engine consumes.
"""

from __future__ import annotations

import re
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _parse_iso(ts: str) -> "datetime":
    """Parse an ISO-8601 timestamp from a hyperslab URL or fixture
    config to an aware datetime for range comparison.  Accepts a bare
    'Z' suffix and fractional seconds; raises ValueError (loud, with the
    offending string) on anything unparseable — a silent 404 on format
    drift was the old failure mode (ADVICE r8)."""
    from datetime import datetime, timezone

    s = ts.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    try:
        dt = datetime.fromisoformat(s)
    except ValueError as e:
        raise ValueError(f"unparseable hyperslab timestamp {ts!r}") from e
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt


def _parse_tabledap_query(raw_query: str) -> tuple[list[str], list[tuple[str, str, str]]]:
    """'time%2Clat...&time%3E%3D2024-...' -> (projection, constraints);
    constraints are (col, op, literal) with op in {>=, <=, >, <, =}."""
    if not raw_query:
        return [], []
    parts = [urllib.parse.unquote(p) for p in raw_query.split("&")]
    proj = [c for c in parts[0].split(",") if c] if parts else []
    cons: list[tuple[str, str, str]] = []
    for p in parts[1:]:
        for op in (">=", "<=", ">", "<", "="):
            if op in p:
                col, lit = p.split(op, 1)
                cons.append((col, op, lit))
                break
    return proj, cons


def _iso(s: str):
    from datetime import datetime, timezone

    try:
        d = datetime.fromisoformat(s[:-1] if s.endswith("Z") else s)
    except ValueError:
        return None
    return d if d.tzinfo else d.replace(tzinfo=timezone.utc)


def _cmp(op: str, a: str, b: str) -> bool:
    # numeric constraints compare as numbers; ISO-8601 timestamps parse
    # (handles MIXED layouts: a fractional-second hwm like ...00.500000Z
    # vs whole-second cells, where text order is wrong); equal-layout
    # strings fall back to text
    try:
        a2, b2 = float(a), float(b)
    except ValueError:
        ia, ib = _iso(a), _iso(b)
        a2, b2 = (ia, ib) if ia is not None and ib is not None else (a, b)
    return {
        ">=": a2 >= b2,
        "<=": a2 <= b2,
        ">": a2 > b2,
        "<": a2 < b2,
        "=": a2 == b2,
    }[op]


class ErddapFixtureServer:
    def __init__(
        self,
        csvp_fixtures: dict[str, str] | None = None,
        raw_fixtures: dict[str, str] | None = None,
        grid_fixtures: dict[str, list[tuple[str, str, str]]] | None = None,
    ):
        self.csvp_fixtures = dict(csvp_fixtures or {})
        self.raw_fixtures = dict(raw_fixtures or {})
        # griddap hyperslab dispatch: dataset_id -> [(iso_start, iso_end,
        # nc_path)] time divisions.  A GET /griddap/{id}.nc?var[(t0):s:(t1)]…
        # serves the UNIQUE division fully contained in [t0, t1] — the
        # time-sliced protocol the reference's chunked griddap downloads
        # speak (one division per URL, data_wrangler.py:592-604); a slab
        # matching zero or several divisions is a caller bug -> 404.
        self.grid_fixtures = dict(grid_fixtures or {})
        self._fail: list[dict] = []  # {"match": str, "left": int, "status": int}
        self._delay: list[dict] = []  # {"match": str, "seconds": float}
        self.request_log: list[str] = []
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        # Last-Modified stamp for the whole dataset set; bump with
        # touch() to simulate new upstream data (drives the ST2
        # conditional-fetch gate: If-Modified-Since at/after it -> 304)
        self.last_modified = "Mon, 04 Mar 2024 00:00:00 GMT"

    def touch(self, http_date: str) -> None:
        """Advance the served Last-Modified (simulates fresh data)."""
        self.last_modified = http_date

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> str:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr noise
                pass

            def do_GET(self):
                server._handle(self)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    # -- failure injection ---------------------------------------------------
    def fail_next(self, match: str, n: int, status: int = 503) -> None:
        """The next ``n`` requests whose decoded path+query contains
        ``match`` return ``status`` instead of data."""
        self._fail.append({"match": match, "left": n, "status": status})

    def delay(self, match: str, seconds: float) -> None:
        """Matching requests sleep first (drives client-side timeouts)."""
        self._delay.append({"match": match, "seconds": seconds})

    def _not_newer(self, since: str) -> bool:
        """True when the served data is not newer than ``since``."""
        from email.utils import parsedate_to_datetime

        try:
            return parsedate_to_datetime(
                self.last_modified
            ) <= parsedate_to_datetime(since)
        except (TypeError, ValueError):
            return False  # unparsable header: serve the full response

    # -- request handling ----------------------------------------------------
    def _handle(self, h: BaseHTTPRequestHandler) -> None:
        decoded = urllib.parse.unquote(h.path)
        self.request_log.append(decoded)
        for d in self._delay:
            if d["match"] in decoded:
                time.sleep(d["seconds"])
        for f in self._fail:
            if f["left"] > 0 and f["match"] in decoded:
                f["left"] -= 1
                h.send_response(f["status"])
                h.end_headers()
                return
        since = h.headers.get("If-Modified-Since")
        if since is not None and self._not_newer(since):
            h.send_response(304)
            h.end_headers()
            return
        path, _, query = h.path.partition("?")
        if path.startswith("/tabledap/") and path.endswith(".csvp"):
            dataset_id = path[len("/tabledap/") : -len(".csvp")]
            src = self.csvp_fixtures.get(dataset_id)
            if src is None:
                h.send_response(404)
                h.end_headers()
                return
            body = self._csvp_response(src, query)
            h.send_response(200)
            h.send_header("Content-Type", "text/csv")
            h.send_header("Content-Length", str(len(body)))
            h.send_header("Last-Modified", self.last_modified)
            h.end_headers()
            h.wfile.write(body)
            return
        if path.startswith("/griddap/") and path.endswith(".nc"):
            dataset_id = path[len("/griddap/") : -len(".nc")]
            divisions = self.grid_fixtures.get(dataset_id)
            m = re.search(
                r"\[\(([^)]+)\):\d+:\(([^)]+)\)\]",
                urllib.parse.unquote(query),
            )
            # no hyperslab in the query -> fall through to raw_fixtures
            # (whole-file spool GETs share the path with slab requests)
            if divisions is not None and m is not None:
                # Parse both sides to datetime before comparing (ADVICE
                # r8): raw lexicographic substring comparison silently
                # 404s every slab on any format drift between the client
                # URL and the fixture config (missing 'Z', fractional
                # seconds, padding).  _parse_iso fails LOUDLY on an
                # unparseable timestamp instead.
                lo, hi = _parse_iso(m.group(1)), _parse_iso(m.group(2))
                hits = [
                    p
                    for (t0, t1, p) in divisions
                    if lo <= _parse_iso(t0) and _parse_iso(t1) <= hi
                ]
                if len(hits) != 1:
                    h.send_response(404)
                    h.end_headers()
                    return
                with open(hits[0], "rb") as f:
                    body = f.read()
                h.send_response(200)
                h.send_header("Content-Type", "application/x-netcdf")
                h.send_header("Content-Length", str(len(body)))
                h.send_header("Last-Modified", self.last_modified)
                h.end_headers()
                h.wfile.write(body)
                return
        raw = self.raw_fixtures.get(path)
        if raw is not None:
            with open(raw, "rb") as f:
                body = f.read()
            h.send_response(200)
            h.send_header("Content-Type", "application/octet-stream")
            h.send_header("Content-Length", str(len(body)))
            h.send_header("Last-Modified", self.last_modified)
            h.end_headers()
            h.wfile.write(body)
            return
        h.send_response(404)
        h.end_headers()

    def _csvp_response(self, src: str, raw_query: str) -> bytes:
        from .csvp import split_csvp_name

        proj, cons = _parse_tabledap_query(raw_query)
        with open(src) as f:
            lines = f.read().splitlines()
        headers = lines[0].split(",")
        clean = [split_csvp_name(c)[0] for c in headers]
        idx = {name: i for i, name in enumerate(clean)}
        keep = [idx[c] for c in proj if c in idx] or list(range(len(headers)))
        out = [",".join(headers[i] for i in keep)]
        for line in lines[1:]:
            if not line:
                continue
            cells = line.split(",")
            ok = True
            for col, op, lit in cons:
                i = idx.get(col)
                if i is not None and not _cmp(op, cells[i], lit):
                    ok = False
                    break
            if ok:
                out.append(",".join(cells[i] for i in keep))
        return ("\n".join(out) + "\n").encode()
