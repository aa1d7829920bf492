"""Reasoning splitter + tool-call scanner unit tests (reference §2.1 #15/#16
stream-time state machines)."""

import json

from llama_box_tpu.server.reasoning import (
    ReasoningSplitter, detect_reasoning_markers,
)
from llama_box_tpu.server.toolcall import (
    ToolCallScanner, migrate_functions,
)


def feed_chunks(obj, chunks):
    content, reasoning, calls = "", "", []
    for ch in chunks:
        out = obj.feed(ch)
        if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], str):
            content += out[0]
            reasoning += out[1]
        else:
            content += out[0]
            calls.extend(out[1])
    return content, reasoning, calls


# -- reasoning ---------------------------------------------------------------

def test_detect_markers():
    assert detect_reasoning_markers("{{...}}</think>{{...}}") == \
        ("<think>", "</think>")
    assert detect_reasoning_markers("plain template") is None
    assert detect_reasoning_markers(None) is None


def test_reasoning_split_basic():
    r = ReasoningSplitter("<think>", "</think>")
    c, rr, _ = feed_chunks(r, ["<think>let me think</think>the answer"])
    assert rr == "let me think"
    assert c == "the answer"


def test_reasoning_split_across_chunks():
    r = ReasoningSplitter("<think>", "</think>")
    chunks = ["<th", "ink>ab", "c</th", "ink>st", "uff"]
    c, rr, _ = feed_chunks(r, chunks)
    c2, r2 = r.flush()
    assert rr + r2 == "abc"
    assert c + c2 == "stuff"


def test_reasoning_force_open():
    r = ReasoningSplitter("<think>", "</think>", force_open=True)
    c, rr, _ = feed_chunks(r, ["already thinking</think>done"])
    assert rr == "already thinking"
    assert c == "done"


def test_reasoning_in_content_mode():
    r = ReasoningSplitter("<think>", "</think>", in_content=True)
    c, rr, _ = feed_chunks(r, ["<think>x</think>y"])
    assert c == "<think>x</think>y"
    assert rr == ""


def test_reasoning_unclosed_flushes_to_reasoning():
    r = ReasoningSplitter("<think>", "</think>")
    r.feed("<think>never ends")
    r.flush()
    assert r.reasoning_text == "never ends"
    assert r.content_text == ""


# -- tool calls --------------------------------------------------------------

def test_toolcall_chatml_wrapped():
    s = ToolCallScanner("chatml")
    text = ('I will check the weather. <tool_call>{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}</tool_call> done')
    c, calls = s.feed(text)
    c += s.flush()
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}
    assert "I will check the weather." in c
    assert "<tool_call>" not in c


def test_toolcall_streamed_chunks():
    s = ToolCallScanner("chatml")
    chunks = ['Let me ', 'call: <tool', '_call>{"name": "f", "argum',
              'ents": {"x": 1}}</tool_call>']
    content, _, calls = feed_chunks(s, chunks)
    assert len(calls) == 1
    assert calls[0].name == "f"
    assert "Let me call:" in content
    assert "tool_call" not in content


def test_toolcall_llama3_bare_json():
    s = ToolCallScanner("llama3")
    c, calls = s.feed('{"name": "sq", "parameters": {"n": 4}}')
    assert len(calls) == 1
    assert calls[0].name == "sq"
    assert json.loads(calls[0].arguments) == {"n": 4}


def test_toolcall_mistral_array():
    s = ToolCallScanner("mistral")
    c, calls = s.feed('[TOOL_CALLS][{"name": "a", "arguments": {}}, '
                      '{"name": "b", "arguments": {"k": "v"}}]')
    assert [x.name for x in calls] == ["a", "b"]


def test_toolcall_parallel_wrapped():
    s = ToolCallScanner("qwen")
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {}}</tool_call>')
    c, calls = s.feed(text)
    assert [x.name for x in calls] == ["a", "b"]


def test_toolcall_unfinished_flushes_as_content():
    s = ToolCallScanner("chatml")
    c, calls = s.feed('<tool_call>{"name": "broken"')
    assert calls == []
    tail = s.flush()
    assert '{"name": "broken"' in tail


def test_migrate_functions():
    tools, choice = migrate_functions({
        "functions": [{"name": "f", "parameters": {}}],
        "function_call": {"name": "f"},
    })
    assert tools[0]["type"] == "function"
    assert tools[0]["function"]["name"] == "f"
    assert choice["function"]["name"] == "f"
    tools2, choice2 = migrate_functions({"tools": [{"type": "function"}]})
    assert choice2 == "auto"


def test_parallel_tool_calls_disabled():
    s = ToolCallScanner("qwen", parallel=False)
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {}}</tool_call>')
    c, calls = s.feed(text)
    c += s.flush()
    assert [x.name for x in s.tool_calls] == ["a"]


def test_tools_grammar_builder():
    from llama_box_tpu.grammar import Grammar
    from llama_box_tpu.server.toolcall import tools_grammar

    tools = [{"type": "function", "function": {
        "name": "get_weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}},
                       "required": ["city"]}}}]
    tg = tools_grammar(tools, "chatml")
    assert tg is not None
    gbnf, triggers = tg
    assert triggers == ("<tool_call>",)
    g = Grammar(gbnf)
    ok = g.accept_bytes(
        b'{"name": "get_weather", "arguments": {"city": "Paris"}}')
    assert ok and g.completed
    g2 = Grammar(gbnf)
    assert not g2.accept_bytes(b'{"name": "bogus_tool"')
    # bare-JSON formats stay scan-only
    assert tools_grammar(tools, "llama3") is None


def test_lazy_grammar_sampler_flow():
    """HostSampler: unconstrained until the trigger, constrained through
    the call JSON, unconstrained again after completion."""
    import numpy as np

    from llama_box_tpu.grammar import Grammar
    from llama_box_tpu.sampling import HostSampler, SamplerParams
    from llama_box_tpu.server.toolcall import tools_grammar

    tools = [{"type": "function", "function": {
        "name": "f", "parameters": {
            "type": "object", "properties": {"x": {"type": "integer"}},
            "required": ["x"]}}}]
    gbnf, triggers = tools_grammar(tools, "chatml")

    class ByteTok:
        n_vocab = 256
        eos_id = 0

        def is_eog(self, t):
            return t == 0

        def is_control(self, t):
            return False

        def token_bytes(self, t, render_special=False):
            return bytes([t])

    sp = SamplerParams(temp=0.0, grammar_lazy=True,
                       grammar_triggers=triggers)
    hs = HostSampler(sp, Grammar(gbnf), ByteTok())
    assert hs.grammar is None          # unarmed: unconstrained
    for b in b"some text <tool_call>":
        hs.accept(b)
    assert hs.grammar is not None      # trigger armed the grammar
    for b in b'{"name": "f", "arguments": {"x": 3}}':
        assert hs._token_allowed(b), chr(b)
        hs.accept(b)
    assert hs.grammar is None          # call complete: re-armed
    for b in b"</tool_call> done":
        hs.accept(b)                   # trailing text unconstrained


def test_gpt_oss_harmony_reasoning_split():
    """gpt-oss harmony: reasoning spans from the analysis channel to the
    FINAL channel header (reference httpserver.hpp:3058-3060); commentary
    between <|end|> and the final header stays inside reasoning."""
    from llama_box_tpu.server.reasoning import GPT_OSS_PAIR
    tmpl = "{%...%}<|start|>assistant<|channel|>final<|message|>"
    assert detect_reasoning_markers(tmpl) == GPT_OSS_PAIR
    # any harmony template activates the pair even without the end marker
    assert detect_reasoning_markers("<|channel|>x") == GPT_OSS_PAIR

    r = ReasoningSplitter(*GPT_OSS_PAIR)
    text = ("<|channel|>analysis<|message|>think think<|end|>"
            "<|start|>assistant<|channel|>final<|message|>Hello!")
    content, reasoning = "", ""
    for i in range(0, len(text), 7):   # ragged chunks exercise holdback
        c, g = r.feed(text[i:i + 7])
        content += c
        reasoning += g
    c, g = r.flush()
    content += c
    reasoning += g
    assert content == "Hello!"
    assert reasoning == "think think<|end|>"


def test_gpt_oss_alias_and_builtin_writer():
    from llama_box_tpu.server.chat import detect_alias, _builtin_gpt_oss
    assert detect_alias("{{'<|channel|>'}}...") == "gpt-oss"
    out = _builtin_gpt_oss([{"role": "system", "content": "S"},
                            {"role": "user", "content": "U"}], True)
    assert out == ("<|start|>developer<|message|>S<|end|>"
                   "<|start|>user<|message|>U<|end|><|start|>assistant")
