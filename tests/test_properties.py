"""Property-based tests (hypothesis) over the pure-Python planner and
function layers — fast, no Spark session needed."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from erddap2agol_spark.functions.datetimes import _decode_one
from erddap2agol_spark.operators.convert import detect_type
from erddap2agol_spark.plans import chunking
from erddap2agol_spark.sinks.publish import clean_tags, flatten_tags
from erddap2agol_spark.sources.das import parse_das_text

DT = st.datetimes(
    min_value=datetime(1971, 1, 1), max_value=datetime(2200, 1, 1)
).map(lambda d: d.replace(microsecond=0))


@given(
    start=DT,
    span_s=st.integers(min_value=1, max_value=10 * 365 * 24 * 3600),
    rows=st.integers(min_value=1, max_value=10_000_000),
    chunk=st.integers(min_value=1, max_value=1_000_000),
)
@settings(max_examples=200, deadline=None)
def test_time_slices_invariants(start, span_s, rows, chunk):
    end = start + timedelta(seconds=span_s)
    slices = chunking.time_slices(start, end, rows, chunk)
    assert len(slices) == chunking.n_chunks(rows, chunk)
    assert slices[0].start == start and slices[-1].end == end
    for a, b in zip(slices, slices[1:]):
        assert a.end == b.start  # continuous, no gaps or overlaps
    for s in slices:
        assert s.start <= s.end


@given(st.integers(min_value=1, max_value=10**9), st.integers(min_value=1, max_value=10**6))
def test_chunk_count_bounds(rows, chunk):
    k = chunking.n_chunks(rows, chunk)
    assert (k - 1) * chunk < rows <= k * chunk


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=20))
def test_detect_type_ints(vals):
    samples = [str(v) for v in vals]
    assert detect_type("count", samples) == "integer"
    assert detect_type("last_updated", samples) == "date"  # name heuristic


@given(st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), min_size=1, max_size=20))
def test_detect_type_floats(vals):
    samples = [repr(float(v)) for v in vals]
    assert detect_type("reading", samples) in ("float", "integer")


@given(DT)
@settings(max_examples=100, deadline=None)
def test_decode_datetime_iso_roundtrip(dt):
    assert _decode_one(dt.isoformat()) == dt
    assert _decode_one(dt.strftime("%Y-%m-%dT%H:%M:%SZ")) == dt


@given(st.integers(min_value=0, max_value=2**31))
def test_decode_datetime_epoch_roundtrip(epoch):
    got = _decode_one(str(epoch))
    assert got == datetime.fromtimestamp(epoch, tz=timezone.utc).replace(tzinfo=None)


@given(
    st.recursive(
        st.one_of(st.none(), st.text(max_size=8)),
        lambda inner: st.lists(inner, max_size=4),
        max_leaves=20,
    )
)
def test_flatten_tags_total(tags):
    if not isinstance(tags, list):
        tags = [tags]
    out = flatten_tags(tags)
    assert all(isinstance(t, str) for t in out)
    cleaned = clean_tags(tags)
    assert len(cleaned) == len(set(cleaned))  # always deduped


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh_", min_size=1, max_size=10),
            st.text(alphabet="abcdefgh_", min_size=1, max_size=10),
            st.text(alphabet="abcdefgh 0123456789.", max_size=20),
        ),
        max_size=10,
    )
)
def test_parse_das_never_crashes_and_attrs_survive(entries):
    """A well-formed DAS block for arbitrary var/attr/value always parses
    to exactly its attribute rows."""
    lines = ["Attributes {"]
    for var, attr, val in entries:
        lines.append(f" {var} {{")
        lines.append(f'  String {attr} "{val}";')
        lines.append(" }")
    lines.append("}")
    rows = parse_das_text("\n".join(lines), "ds")
    assert len(rows) == len(entries)
    for (var, attr, val), row in zip(entries, rows):
        assert row[1] == var and row[2] == attr and row[4] == val


@given(
    s=st.one_of(
        st.none(),
        st.text(max_size=40),
        st.text(alphabet="0123456789:/-T +.Zabcdefghijklmnopqrstuvwxyz,", max_size=40),
    )
)
@settings(max_examples=300, deadline=None)
def test_decode_datetime_never_raises(s):
    """The universal decoder's contract on garbage is None, never an
    exception — a feed with one mangled timestamp must not kill the
    ingest (same robustness contract the try_cast fix gives F9)."""
    out = _decode_one(s)
    assert out is None or isinstance(out, datetime)


@given(
    epoch=st.integers(-10**13, 10**14),
)
@settings(max_examples=200, deadline=None)
def test_decode_datetime_epoch_digits_never_raise(epoch):
    """Every pure-digit string hits the epoch branch (or a width
    heuristic) and must come back as a datetime or None — never an
    OverflowError/OSError from fromtimestamp on out-of-range values."""
    out = _decode_one(str(epoch))
    assert out is None or isinstance(out, datetime)
