"""GBNF grammar engine + JSON-schema conversion tests (reference capability:
"grammar"/"json_schema" request fields, SURVEY.md §2.1 #14)."""

import json

import pytest

from llama_box_tpu.grammar import (
    Grammar, GrammarError, JSON_OBJECT_GRAMMAR, json_schema_to_grammar,
)


def accepts(g: Grammar, text: str, complete=True) -> bool:
    g = g.copy()
    if not g.accept_bytes(text.encode()):
        return False
    return g.completed if complete else True


def test_literal_alternatives():
    g = Grammar('root ::= "yes" | "no"')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe", complete=False)
    assert not accepts(g, "y")  # incomplete
    assert accepts(g, "y", complete=False)


def test_char_class_and_repetition():
    g = Grammar('root ::= [a-z]+ [0-9]*')
    assert accepts(g, "abc")
    assert accepts(g, "abc123")
    assert not accepts(g, "123", complete=False)
    assert not accepts(g, "abC", complete=False)


def test_negated_class():
    g = Grammar('root ::= "<" [^>]* ">"')
    assert accepts(g, "<hello world>")
    assert not accepts(g, "<a>b", complete=False)


def test_groups_and_nesting():
    g = Grammar('root ::= ("a" | "b") ("c" "d")+')
    assert accepts(g, "acd")
    assert accepts(g, "bcdcd")
    assert not accepts(g, "ab", complete=False)


def test_rule_refs_and_recursion():
    g = Grammar('''
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+ | "(" expr ")"
''')
    assert accepts(g, "1+2+3")
    assert accepts(g, "(1+2)+(3+(4+5))")
    assert not accepts(g, "1+", complete=False) or not accepts(g, "1+")


def test_bounded_repetition():
    g = Grammar('root ::= [0-9]{2,4}')
    assert not accepts(g, "1")
    assert accepts(g, "12")
    assert accepts(g, "1234")
    assert not accepts(g, "12345", complete=False)


def test_utf8_and_partial_bytes():
    g = Grammar('root ::= [\\u00e0-\\uffff]+')
    b = "héllo"  # é not in range; test a matching one
    g2 = Grammar('root ::= .+')
    raw = "日本語".encode()
    gg = g2.copy()
    # feed byte-by-byte: partials must be held, not rejected
    for i in range(len(raw)):
        assert gg.accept_bytes(raw[i:i + 1])
    assert gg.completed


def test_accepts_token_tentative():
    g = Grammar('root ::= "ab" "cd"')
    assert g.accepts_token(b"ab")
    assert g.accepts_token(b"abcd")
    assert not g.accepts_token(b"ax")
    # original state unchanged
    assert g.accepts_token(b"a")


def test_must_stop():
    g = Grammar('root ::= "ok"')
    g.accept_bytes(b"ok")
    assert g.completed and g.must_stop
    g2 = Grammar('root ::= "ok" [0-9]*')
    g2.accept_bytes(b"ok")
    assert g2.completed and not g2.must_stop


def test_undefined_rule_and_no_root():
    with pytest.raises(GrammarError):
        Grammar('root ::= foo')
    with pytest.raises(GrammarError):
        Grammar('start ::= "x"')


def matches_json(g: Grammar, obj) -> bool:
    return accepts(g, json.dumps(obj, ensure_ascii=False))


def test_json_object_grammar():
    g = Grammar(JSON_OBJECT_GRAMMAR)
    assert matches_json(g, {"a": 1, "b": [1, 2, "x"], "c": {"d": None}})
    assert not accepts(g, "[1,2]", complete=False)  # root must be object


def test_schema_basic_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name", "age"],
    }
    g = Grammar(json_schema_to_grammar(schema))
    assert matches_json(g, {"name": "bob", "age": 3})
    assert not matches_json(g, {"name": "bob"})
    assert not matches_json(g, {"age": 3, "name": "bob"})  # order enforced


def test_schema_optional_props():
    schema = {
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
        "required": ["a"],
    }
    g = Grammar(json_schema_to_grammar(schema))
    assert matches_json(g, {"a": 1})
    assert matches_json(g, {"a": 1, "b": "x"})


def test_schema_enum_const_array():
    schema = {
        "type": "object",
        "properties": {
            "color": {"enum": ["red", "green"]},
            "tag": {"const": "v1"},
            "nums": {"type": "array", "items": {"type": "integer"},
                     "minItems": 1},
        },
        "required": ["color", "tag", "nums"],
    }
    g = Grammar(json_schema_to_grammar(schema))
    assert matches_json(g, {"color": "red", "tag": "v1", "nums": [1, 2]})
    assert not matches_json(g, {"color": "blue", "tag": "v1", "nums": [1]})
    assert not matches_json(g, {"color": "red", "tag": "v1", "nums": []})


def test_schema_anyof_and_ref():
    schema = {
        "$defs": {"pt": {"type": "object",
                         "properties": {"x": {"type": "number"}},
                         "required": ["x"]}},
        "anyOf": [{"$ref": "#/$defs/pt"}, {"type": "null"}],
    }
    g = Grammar(json_schema_to_grammar(schema))
    assert matches_json(g, {"x": 1.5})
    assert matches_json(g, None)
    assert not matches_json(g, "nope")


def test_schema_string_escapes():
    g = Grammar(json_schema_to_grammar({"type": "string"}))
    assert matches_json(g, "hello \"quoted\" \n line")
    assert matches_json(g, "日本語")


def test_native_grammar_matches_python():
    """The native matcher (native/grammar_core.cpp) must agree with the
    pure-Python pushdown on every operation: randomized byte streams
    (incl. multi-byte UTF-8 split across token boundaries), tentative
    accepts_token, completed/must_stop, copies, and the batched
    filter_pieces."""
    import numpy as np

    from llama_box_tpu import grammar as gmod
    from llama_box_tpu.grammar import Grammar

    gbnfs = [
        'root ::= "a" [b-d]+ "e"?',
        'root ::= obj\nobj ::= "{" pair ("," pair)* "}"\n'
        'pair ::= [a-z]+ ":" [0-9]+',
        'root ::= ("x" | "yy" | zed)* "!"\nzed ::= "z" root',
        'root ::= [^a-m]{2,4} "end"',
        'root ::= "\\u00e9" [\\u00e0-\\u00ff]* "."',   # multi-byte chars
    ]
    if Grammar(gbnfs[0])._nst is None:
        import pytest
        pytest.skip("native grammar core unavailable")

    orig = gmod._native_grammar_lib
    rng = np.random.default_rng(0)
    probes = [b"a", b"bc", b"e", b"!", b"x", b"z", b"end",
              "é".encode(), "à.".encode(), b"{ab:12}", b"\xc3", b"\xa9",
              b"\xff", b"no"]
    try:
        for gb in gbnfs:
            gn = Grammar(gb)
            gmod._native_grammar_lib = lambda: None
            gp = Grammar(gb)
            gmod._native_grammar_lib = orig
            assert gn._nst is not None and gp._nst is None
            for step in range(60):
                assert gn.completed == gp.completed, (gb, step)
                assert gn.must_stop == gp.must_stop, (gb, step)
                assert gn.filter_pieces(probes) \
                    == [gp.accepts_token(p) for p in probes], (gb, step)
                piece = probes[int(rng.integers(len(probes)))]
                ok_n = gn.accepts_token(piece)
                ok_p = gp.accepts_token(piece)
                assert ok_n == ok_p, (gb, step, piece)
                if ok_n:
                    # accept on COPIES so the originals only ever hold
                    # valid-prefix state (accept_bytes may partially
                    # advance on failure, by design on both paths)
                    gn2, gp2 = gn.copy(), gp.copy()
                    assert gn2.accept_bytes(piece)
                    assert gp2.accept_bytes(piece)
                    gn, gp = gn2, gp2
    finally:
        gmod._native_grammar_lib = orig
