"""Unit tests for the session-4 blocking-catalog kernels (no Ray needed:
the e2e paths are covered by the oracle-equivalence sweep)."""

import sys

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.linkage_string import (  # noqa: E402
    _RULE_KC,
    _RULE_MH,
    _RULE_NAMES,
    _RULE_SDX,
    soundex_code,
)


def test_soundex_nara_vectors():
    # the canonical examples from the NARA soundex specification
    cases = {
        "washington": "w252",
        "lee": "l000",
        "gutierrez": "g362",
        "pfister": "p236",     # adjacent same-code collapse at the start
        "jackson": "j250",
        "tymczak": "t522",     # vowel separates equal codes -> coded twice
        "vandeusen": "v532",
        "ashcraft": "a261",    # h is transparent: s,c collapse across it
        "robert": "r163",
        "rupert": "r163",
        "smith": "s530",
        "smyth": "s530",
    }
    for tok, want in cases.items():
        assert soundex_code(tok) == want, (tok, soundex_code(tok), want)


def test_soundex_edge_cases():
    assert soundex_code("") == ""
    assert soundex_code("123") == ""          # no letters
    assert soundex_code("a") == "a000"
    assert soundex_code("hw") == "h000"       # transparent letters only
    # case and punctuation insensitivity
    assert soundex_code("O'Brien") == soundex_code("obrien")


def test_rule_bits_disjoint_and_composite():
    bits = [b for _, b in _RULE_NAMES if b not in (
        _RULE_KC | _RULE_SDX | _RULE_MH,)]
    seen = 0
    for b in (_RULE_KC, _RULE_SDX, _RULE_MH):
        assert b & seen == 0, "rule bits must be disjoint"
        seen |= b
    assert dict(_RULE_NAMES)["any"] == seen
    assert len(bits) == 3
