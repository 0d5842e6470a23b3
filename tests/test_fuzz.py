"""Property-based fuzzing of the pure parse surface (hypothesis).

The per-turn contract is "never fail the job": any payload — corrupted
JSON, hostile unicode, truncated XML — must come back as a record with a
well-formed status, never an exception (per-page error isolation analogue,
reference pdf/converter.py:160-166). These run WITHOUT Spark (pure Python),
fuzzing exactly the code the Arrow workers execute.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from bella_domify_spark.functions.listmark import recognize_list
from bella_domify_spark.parsers.dispatch import detect_format, parse_payload
from bella_domify_spark.parsers.layout_flat import layout_record

REQUIRED_KEYS = {"extracted_text", "domtree_json", "fmt", "n_nodes", "status"}

# text including format magic prefixes so the dispatcher's format branches
# all get fuzzed, not just the plaintext fallback
payloads = st.one_of(
    st.text(max_size=300),
    st.text(max_size=200).map(lambda s: '{"pages"' + s),
    st.text(max_size=200).map(lambda s: '{"sheets"' + s),
    st.text(max_size=200).map(lambda s: '{"slides"' + s),
    st.text(max_size=200).map(lambda s: "<w:document" + s),
    st.text(max_size=200).map(lambda s: "<html" + s),
    st.text(max_size=200).map(lambda s: "<!DOCTYPE html>" + s),
    # tag soup: html-ish markup with unbalanced/hostile structure
    st.lists(st.sampled_from(
        ["<p>", "</p>", "<div class='sidebar'>", "</div>", "<table>", "<tr>",
         "<td rowspan='x'>", "</table>", "<li>", "<script>", "</script>",
         "<h1>", "</h2>", "<pre>", "&amp;", "&#x41;", "&#xD800;", "&#57343;", "&bogus;", "txt ",
         "<![CDATA[", "<!--", "-->", "<br/>", "<footer>"]),
        max_size=30).map(lambda parts: "<html>" + "".join(parts)),
    st.recursive(
        st.one_of(st.none(), st.booleans(), st.integers(), st.floats(),
                  st.text(max_size=20)),
        lambda children: st.one_of(st.lists(children, max_size=4),
                                   st.dictionaries(st.text(max_size=8),
                                                   children, max_size=4)),
        max_leaves=20,
    ).map(lambda v: json.dumps({"pages": v})),
    st.recursive(
        st.one_of(st.none(), st.integers(), st.text(max_size=20)),
        lambda children: st.one_of(st.lists(children, max_size=4),
                                   st.dictionaries(st.text(max_size=8),
                                                   children, max_size=4)),
        max_leaves=20,
    ).map(lambda v: json.dumps({"sheets": v})),
)


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_parse_payload_never_raises(text):
    rec = parse_payload(text)
    assert REQUIRED_KEYS <= set(rec)
    assert rec["status"] == "ok" or rec["status"].startswith(
        ("error:", "skipped_empty"))
    assert isinstance(rec["extracted_text"], str)
    # Arrow/utf-8 encodability IS part of the contract: a lone surrogate in
    # the output would kill the whole pandas-UDF batch, not just one row
    rec["extracted_text"].encode("utf-8")
    if rec["domtree_json"] is not None:
        rec["domtree_json"].encode("utf-8")
        json.loads(rec["domtree_json"])  # always valid JSON when present


@settings(max_examples=300, deadline=None)
@given(payloads)
def test_layout_record_never_raises(text):
    rec = layout_record(text)
    assert set(rec) == {"layout_json", "layout_text", "n_blocks"}
    assert isinstance(rec["layout_text"], str)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_recognize_list_and_detect_never_raise(text):
    lt, tag = recognize_list(text)
    assert lt is None or isinstance(lt, (int, str))
    assert detect_format(text) in {"pdflike", "docxlike", "markdown",
                                   "plaintext", "xlsxlike", "pptxlike",
                                   "empty"}
