"""Property test: the first-char-gated list recognizer is exactly equivalent
to the reference's test-all-41-rules-in-order implementation."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bella_domify_spark.functions.listmark import (
    recognize_list,
    recognize_list_reference,
)

_interesting = st.sampled_from([
    "1. item", "1.2.3 nested", "12、chinese", "一、cjk", "(3) paren",
    "（三）cjk paren", "a) alpha", "Z) upper", "① circled", "⑴ paren-circ",
    "Ⓐ ringed", "[7] cite", "第三章 chapter", "第3步 step", "⒈ dotted",
    "Introduction..........3", "plain words", "• bullet", "★ star",
    "  1. indented", "\t第一节 tabbed", "", " ", "。start punct",
    "#hash", "-dash", "_under", "你好 world", "3", "(", "第",
])

_random = st.text(
    alphabet=st.characters(codec="utf-8", categories=(
        "Lu", "Ll", "Nd", "Po", "Ps", "Pe", "Zs", "So", "No", "Lo")),
    max_size=24)


@settings(max_examples=400, deadline=None)
@given(st.one_of(_interesting, _random))
def test_gated_equals_reference(text):
    assert recognize_list(text) == recognize_list_reference(text)
