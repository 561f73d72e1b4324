"""Property fuzz for the live-HTTP surfaces (round 5).

All Spark-free: the chunk-coverage property drives the URL compiler and
the fixture server's tabledap filter directly (the same code the
erddap_csvp_http scan tasks exercise per partition), so hypothesis can
afford hundreds of examples. The one-Spark-integration versions of
these properties live in test_http_connector.py.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from erddap2agol_spark.sources.csvp import split_csvp_name
from erddap2agol_spark.sources.erddap_httpd import (
    ErddapFixtureServer,
    _parse_tabledap_query,
)
from erddap2agol_spark.sources.erddap_url import TimeRange, tabledap_chunk_urls

_BASE = dt.datetime(2024, 3, 1)


def _csvp_text(times: list[dt.datetime]) -> str:
    lines = ["time (UTC),v (m)"]
    for i, t in enumerate(sorted(times)):
        lines.append(f"{t.strftime('%Y-%m-%dT%H:%M:%SZ')},{float(i)}")
    return "\n".join(lines) + "\n"


@settings(max_examples=200, deadline=None)
@given(
    # row instants at second granularity inside two days
    offsets=st.sets(
        st.integers(min_value=0, max_value=2 * 86400), min_size=1, max_size=40
    ),
    # free interior chunk boundaries
    cuts=st.sets(
        st.integers(min_value=0, max_value=2 * 86400), min_size=0, max_size=5
    ),
    # indices of rows whose instants become boundaries too — FORCING the
    # boundary-on-row case (a random collision is ~0.1% per example)
    on_row=st.lists(st.integers(min_value=0, max_value=39), max_size=3),
)
def test_chunked_fetch_covers_each_row_exactly_once(
    tmp_path_factory, offsets, cuts, on_row
):
    """The half-open chunk contract as a property: for ANY row placement
    and ANY chunk boundaries (including boundaries exactly on rows), the
    union of per-chunk tabledap responses contains every in-range row
    EXACTLY once — no boundary duplication, no gap."""
    srt = sorted(offsets)
    cuts = set(cuts) | {srt[i % len(srt)] for i in on_row}
    times = [_BASE + dt.timedelta(seconds=o) for o in srt]
    src = tmp_path_factory.mktemp("fuzz") / "d.csvp"
    src.write_text(_csvp_text(times))

    lo, hi = _BASE, _BASE + dt.timedelta(seconds=2 * 86400)
    bounds = [lo] + [
        _BASE + dt.timedelta(seconds=c) for c in sorted(cuts) if 0 < c < 2 * 86400
    ] + [hi]
    chunks = [TimeRange(a, b) for a, b in zip(bounds, bounds[1:])]

    urls = tabledap_chunk_urls("http://x", "d", ["time", "v"], chunks)
    srv = ErddapFixtureServer()
    got: list[str] = []
    for u in urls:
        _, _, raw_query = u.partition("?")
        body = srv._csvp_response(str(src), raw_query).decode()
        got.extend(line for line in body.splitlines()[1:] if line)
    want = [line for line in src.read_text().splitlines()[1:] if line]
    assert sorted(got) == sorted(want)
    assert len(got) == len(set(got))  # exactly once — no boundary dup


@settings(max_examples=200, deadline=None)
@given(
    name=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_0", min_size=1, max_size=12
    ).filter(lambda s: "(" not in s),
    units=st.one_of(
        st.none(),
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz /^0123456789()-",
            min_size=1,
            max_size=16,
        ).filter(lambda s: s.strip() and not s.strip().startswith("(")),
    ),
)
def test_csvp_header_units_roundtrip(name, units):
    """'name (units)' headers split back to (name, units) for any legal
    name and unit string — including units with nested parens (m s^(-1))."""
    header = f"{name} ({units})" if units is not None else name
    got_name, got_units = split_csvp_name(header)
    assert got_name == name.strip()
    if units is None:
        assert got_units is None
    else:
        assert got_units == units


@settings(max_examples=100, deadline=None)
@given(
    cols=st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    n_cons=st.integers(min_value=0, max_value=3),
)
def test_tabledap_query_parser_roundtrip(cols, n_cons):
    """The fixture server's query parser inverts the URL compiler's
    encoding for any projection and constraint chain."""
    from urllib.parse import quote

    proj = "%2C".join(cols)
    cons = [
        (cols[i % len(cols)], op, f"2024-03-0{(i % 8) + 1}T00:00:00Z")
        for i, op in enumerate([">=", "<", "<="][:n_cons])
    ]
    enc = {">=": "%3E%3D", "<": "%3C", "<=": "%3C%3D"}
    raw = proj + "".join(f"&{c}{enc[op]}{quote(v)}" for c, op, v in cons)
    got_proj, got_cons = _parse_tabledap_query(raw)
    assert got_proj == cols
    assert got_cons == cons


@settings(max_examples=150, deadline=None)
@given(
    n_rows=st.integers(min_value=0, max_value=25),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_csvp_parse_seam_roundtrip(n_rows, seed):
    """Random typed csvp bodies (doubles with NaN holes, booleans with
    holes, longs, strings, ISO times) survive the connector's parse
    seam: _read_csvp_text + _table_for_schema reproduce the source
    values, nulls where the wire says NaN, in schema order."""
    import math
    import random

    from erddap2agol_spark.sources.erddap_http import (
        _read_csvp_text,
        _schema_from_ddl,
        _table_for_schema,
    )

    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        t = _BASE + dt.timedelta(seconds=i * 61)
        v = None if rng.random() < 0.2 else round(rng.uniform(-50, 50), 3)
        b = rng.choice([True, False, None])
        k = rng.randint(-1000, 1000)
        s = rng.choice(["alpha", "beta", "gamma"])
        rows.append((t, v, b, k, s))
    lines = ["time (UTC),v (m),ok (1),k (count),tag"]
    for t, v, b, k, s in rows:
        lines.append(
            ",".join(
                [
                    t.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "NaN" if v is None else repr(v),
                    "NaN" if b is None else str(b),
                    str(k),
                    s,
                ]
            )
        )
    text = "\n".join(lines) + "\n"
    schema = _schema_from_ddl(
        "time timestamp_ntz, v double, ok boolean, k long, tag string"
    )
    pdf = _read_csvp_text(text)
    if n_rows == 0:
        assert len(pdf) == 0
        return
    tbl = _table_for_schema(pdf, schema)
    got = tbl.to_pylist()
    assert len(got) == n_rows
    for want, g in zip(rows, got):
        t, v, b, k, s = want
        assert g["time"].replace(tzinfo=None) == t
        if v is None:
            assert g["v"] is None or math.isnan(g["v"])
        else:
            assert abs(g["v"] - v) < 1e-9
        assert g["ok"] == b
        assert g["k"] == k
        assert g["tag"] == s
