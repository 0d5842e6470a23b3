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


# --- evaluation-harness invariants over random tree pairs -----------------

def _rand_tree(draw_nodes):
    """Build a domtree JSON from hypothesis-drawn (type, text, n_children)."""
    counter = [0]

    def node(spec, depth):
        t, text, kids = spec
        counter[0] += 1
        el = {"block_type": "text", "layout_type": t, "page_num": [0],
              "text": text}
        return {"order_num": str(counter[0]), "element": el,
                "child": [node(k, depth + 1) for k in kids]}

    return json.dumps({"root": {"order_num": None, "element": None,
                                "child": [node(s, 0) for s in draw_nodes]}})


tree_nodes = st.recursive(
    st.tuples(st.sampled_from(["Text", "Title", "List", "Table"]),
              st.text(max_size=40), st.just([])),
    lambda kids: st.tuples(
        st.sampled_from(["Text", "Title", "List", "Table"]),
        st.text(max_size=40), st.lists(kids, max_size=3)),
    max_leaves=12)


@settings(max_examples=150, deadline=None)
@given(st.lists(tree_nodes, max_size=6), st.lists(tree_nodes, max_size=6))
def test_evaluate_pair_invariants(label_specs, parsed_specs):
    from bella_domify_spark.engine.evaluate import evaluate_pair

    rec = evaluate_pair(_rand_tree(label_specs), _rand_tree(parsed_specs))
    assert 0 <= rec["n_1v1"] <= rec["n_label"]
    assert 0.0 <= rec["mean_edit"] <= 1.0
    assert 0 <= rec["structure_right"] <= rec["structure_total"]
    # confusion weights partition the label nodes exactly
    total_w = sum(c["weight"] for c in rec["confusion"])
    assert abs(total_w - rec["n_label"]) < 1e-9
    assert all(c["weight"] >= 0 for c in rec["confusion"])


@settings(max_examples=80, deadline=None)
@given(st.lists(tree_nodes, min_size=1, max_size=6))
def test_self_evaluation_is_clean(specs):
    # pred == label: every confusion entry is diagonal or a containment
    # 1vN artifact (p_N) — never p_0, and structure is fully preserved
    from bella_domify_spark.engine.evaluate import evaluate_pair

    tree = _rand_tree(specs)
    rec = evaluate_pair(tree, tree)
    assert not any(c["parsed_type"] == "p_0" and c["weight"] > 0
                   for c in rec["confusion"])
    assert rec["structure_right"] == rec["structure_total"]
