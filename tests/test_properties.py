"""Property-based tests (hypothesis) for the byte-exactness-critical
string machinery — these functions must match the reference bit-for-bit
on ALL inputs, not just fixture values."""

from urllib.parse import quote, unquote

from hypothesis import given, settings
from hypothesis import strategies as st

from morph_kgc_spark import model as M
from morph_kgc_spark.functions.encoding import ntriples_escape_py, percent_encode_py

text = st.text(max_size=200)


@given(text)
@settings(max_examples=300, deadline=None)
def test_percent_encode_roundtrips(s):
    # quote(safe='') must be losslessly reversible
    assert unquote(percent_encode_py(s)) == s


@given(text)
@settings(max_examples=300, deadline=None)
def test_percent_encode_output_is_uri_safe(s):
    out = percent_encode_py(s)
    assert all(c.isalnum() or c in "-._~%" for c in out)


@given(text)
@settings(max_examples=300, deadline=None)
def test_ntriples_escape_never_leaves_raw_specials(s):
    out = ntriples_escape_py(s)
    # every raw quote/control char must be preceded by a backslash:
    # strip all escape pairs; nothing escapable may remain
    i, bad = 0, False
    while i < len(out):
        if out[i] == "\\":
            i += 2
            continue
        if out[i] in '"\n\t\b\f\r':
            bad = True
            break
        i += 1
    assert not bad


_UNESCAPES = {"\\": "\\", "n": "\n", "t": "\t", "b": "\b",
              "f": "\f", "r": "\r", '"': '"', "'": "'"}


def _unescape_scan(out: str) -> str:
    """Left-to-right unescape (naive replace chains mis-handle inputs
    like a literal backslash followed by 'n')."""
    res, i = [], 0
    while i < len(out):
        if out[i] == "\\" and i + 1 < len(out) and out[i + 1] in _UNESCAPES:
            res.append(_UNESCAPES[out[i + 1]])
            i += 2
        else:
            res.append(out[i])
            i += 1
    return "".join(res)


@given(text)
@settings(max_examples=300, deadline=None)
def test_ntriples_escape_is_reversible(s):
    assert _unescape_scan(ntriples_escape_py(s)) == s


@given(st.lists(st.text(alphabet=st.characters(
    blacklist_characters="{}\\"), min_size=1, max_size=10), min_size=0, max_size=5))
@settings(max_examples=200, deadline=None)
def test_template_reference_extraction(refs):
    template = "http://x.org/" + "/".join("{" + r + "}" for r in refs)
    assert M.references_in_template(template) == refs


@given(st.text(alphabet=st.characters(blacklist_characters="{}\\"), max_size=30))
@settings(max_examples=200, deadline=None)
def test_template_invariant_is_prefix(prefix):
    template = prefix + "{ref}tail"
    assert M.template_invariant(template) == prefix
