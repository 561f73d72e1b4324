"""Fuzz the DAS metadata parser against a generative model of the format.

The parser (``sources/das.py:parse_das_text``) re-implements the public
OPeNDAP DAS text layout the reference consumes (reference
``src/das_client.py:25-135``). These tests build random DAS documents
from a structured model — variable blocks, ``<type> <name> <value>;``
attribute lines, quoted strings (single- and multi-line), bare numeric
lists — render them to text, and assert the parser recovers exactly the
modeled rows. A second battery feeds arbitrary junk and asserts the
garbage contract: a list comes back, never an exception.

Pure-Python (no SparkSession) so the whole battery runs in milliseconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from erddap2agol_spark.sources.das import parse_das_text

# Identifier-ish names: what ERDDAP emits for variable and attribute
# names (it never emits spaces, braces, or quotes in them).
_NAME = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=12
).filter(lambda s: not s[0].isdigit())

_DATATYPE = st.sampled_from(
    ["String", "Float64", "Float32", "Int32", "Int16", "Byte", "UInt16"]
)

# One line of a quoted-string value. Constraints mirror what the format
# itself can represent unambiguously (the reference parser shares them):
# no embedded double quotes, no line that ends with ';' (a mid-string
# ';' line terminates any DAS attribute), no line equal to '}' or ending
# in '{' (block delimiters), and no leading/trailing whitespace (both
# parsers strip each physical line).
_STR_LINE = (
    st.text(
        alphabet=st.characters(
            codec="ascii", min_codepoint=32, exclude_characters='";'
        ),
        min_size=0,
        max_size=30,
    )
    .map(lambda s: s.strip())
    .filter(lambda s: s != "}" and not s.endswith("{"))
)

_NUM = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
).map(lambda x: f"{x:.6g}")


@st.composite
def _attr_value(draw):
    """(rendered_value_text, expected_parsed_value) pairs."""
    kind = draw(st.sampled_from(["string", "multiline", "number", "numlist"]))
    if kind == "string":
        line = draw(_STR_LINE)
        return f'"{line}"', line
    if kind == "multiline":
        lines = draw(st.lists(_STR_LINE, min_size=2, max_size=4))
        rendered = '"' + "\n".join(lines) + '"'
        return rendered, "\n".join(lines)
    if kind == "number":
        n = draw(_NUM)
        return n, n
    nums = draw(st.lists(_NUM, min_size=2, max_size=4))
    rendered = ", ".join(nums)
    return rendered, rendered


@st.composite
def _das_doc(draw):
    """A DAS document model: [(var, [(datatype, attr, value_pair)])]."""
    n_vars = draw(st.integers(1, 4))
    variables = draw(
        st.lists(_NAME, min_size=n_vars, max_size=n_vars, unique=True)
    )
    doc = []
    for var in variables:
        n_attrs = draw(st.integers(0, 4))
        attrs = draw(
            st.lists(_NAME, min_size=n_attrs, max_size=n_attrs, unique=True)
        )
        doc.append(
            [
                (draw(_DATATYPE), attr, draw(_attr_value()))
                for attr in attrs
            ]
        )
    return list(zip(variables, doc))


def _render(doc, indent="  ") -> str:
    out = ["Attributes {"]
    for var, attrs in doc:
        out.append(f"{indent}{var} {{")
        for datatype, attr, (rendered, _expected) in attrs:
            out.append(f"{indent}{indent}{datatype} {attr} {rendered};")
        out.append(f"{indent}}}")
    out.append("}")
    return "\n".join(out)


@given(doc=_das_doc())
@settings(max_examples=200, deadline=None)
def test_parse_recovers_modeled_rows(doc):
    """Every generated document parses to exactly its model: one row per
    attribute, in document order, with the quoted/numeric value
    normalization the format implies."""
    text = _render(doc)
    rows = parse_das_text(text, "ds")
    expected = [
        ("ds", var, attr, datatype, expected_value)
        for var, attrs in doc
        for datatype, attr, (_rendered, expected_value) in attrs
    ]
    assert rows == expected


@given(doc=_das_doc(), indent=st.sampled_from(["", " ", "\t", "    "]))
@settings(max_examples=50, deadline=None)
def test_parse_is_indentation_insensitive(doc, indent):
    """ERDDAP servers differ in indentation; the parse must not."""
    assert parse_das_text(_render(doc, indent), "x") == parse_das_text(
        _render(doc, "  "), "x"
    )


@given(junk=st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_garbage_contract_never_raises(junk):
    """Arbitrary text — truncated responses, HTML error pages, binary
    noise — yields a (possibly empty) row list, never an exception, and
    every row is a well-formed 5-tuple tagged with the dataset id."""
    rows = parse_das_text(junk, "junk_ds")
    assert isinstance(rows, list)
    for row in rows:
        assert len(row) == 5
        assert row[0] == "junk_ds"
        assert all(isinstance(part, str) for part in row)


@given(doc=_das_doc(), cut=st.integers(0, 10**6))
@settings(max_examples=100, deadline=None)
def test_truncated_document_is_a_prefix_parse(doc, cut):
    """Cutting a document mid-stream (dropped connection) must never
    invent rows: every row parsed from a LINE-boundary truncation is a
    row of the full parse, in order."""
    text = _render(doc)
    lines = text.splitlines()
    truncated = "\n".join(lines[: cut % (len(lines) + 1)])
    full = parse_das_text(text, "ds")
    part = parse_das_text(truncated, "ds")
    assert part == full[: len(part)]
