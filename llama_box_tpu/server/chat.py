"""Chat template application (reference common_chat_templates_apply2 path:
tool_calling.patch + minja jinja engine).

Two routes, like the reference:
- jinja: the GGUF-embedded (or override) template rendered with a
  minja-compatible environment (raise_exception, strftime_now, tojson).
- builtin: template-alias detection from the template text and a table of
  hand-written writers (the reference's legacy llama_chat_apply_template
  route, template.patch) used when --jinja is off or rendering fails.
"""

from __future__ import annotations

import datetime
import json
from typing import Any

import jinja2

from ..utils.logging import SRV_WRN


class ChatMessage(dict):
    """dict with attribute access so jinja templates can use message.role."""
    __getattr__ = dict.get


def _raise_exception(msg: str):
    raise jinja2.TemplateError(msg)


def _strftime_now(fmt: str) -> str:
    return datetime.datetime.now().strftime(fmt)


def _make_env() -> jinja2.Environment:
    env = jinja2.Environment(
        trim_blocks=True, lstrip_blocks=True,
        extensions=["jinja2.ext.loopcontrols"])
    env.filters["tojson"] = lambda v, indent=None: json.dumps(
        v, ensure_ascii=False, indent=indent)
    env.globals["raise_exception"] = _raise_exception
    env.globals["strftime_now"] = _strftime_now
    return env


# -- template alias detection (reference llama_chat_template_alias) ----------

_ALIAS_MARKERS = [
    ("gpt-oss", ["<|channel|>"]),   # harmony format
    ("chatml", ["<|im_start|>"]),
    ("llama4", ["<|header_start|>", "<|header_end|>"]),
    ("llama3", ["<|start_header_id|>", "<|end_header_id|>"]),
    ("llama2", ["[INST]", "<<SYS>>"]),
    ("mistral", ["[INST]"]),
    ("phi3", ["<|user|>", "<|end|>"]),
    ("gemma", ["<start_of_turn>"]),
    ("zephyr", ["<|user|>", "<|assistant|>"]),
    ("deepseek3", ["<｜User｜>", "<｜Assistant｜>"]),
    ("command-r", ["<|START_OF_TURN_TOKEN|>"]),
    ("chatglm4", ["[gMASK]<sop>"]),
]


def detect_alias(template: str | None) -> str:
    if not template:
        return "chatml"
    for alias, markers in _ALIAS_MARKERS:
        if all(m in template for m in markers):
            return alias
    return "chatml"


# -- builtin writers ---------------------------------------------------------


def _builtin_chatml(msgs, add_gen):
    out = []
    for m in msgs:
        out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_gen:
        out.append("<|im_start|>assistant\n")
    return "".join(out)


def _builtin_llama3(msgs, add_gen):
    out = ["<|begin_of_text|>"]
    for m in msgs:
        out.append(f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
                   f"{m['content']}<|eot_id|>")
    if add_gen:
        out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def _builtin_llama4(msgs, add_gen):
    out = ["<|begin_of_text|>"]
    for m in msgs:
        out.append(f"<|header_start|>{m['role']}<|header_end|>\n\n"
                   f"{m['content']}<|eot|>")
    if add_gen:
        out.append("<|header_start|>assistant<|header_end|>\n\n")
    return "".join(out)


def _builtin_llama2(msgs, add_gen):
    out = []
    system = ""
    i = 0
    if msgs and msgs[0]["role"] == "system":
        system = msgs[0]["content"]
        i = 1
    while i < len(msgs):
        if msgs[i]["role"] == "user":
            user = msgs[i]["content"]
            if system:
                user = f"<<SYS>>\n{system}\n<</SYS>>\n\n{user}"
                system = ""
            out.append(f"[INST] {user} [/INST]")
            i += 1
            if i < len(msgs) and msgs[i]["role"] == "assistant":
                out.append(f" {msgs[i]['content']} ")
                i += 1
        else:
            i += 1
    return "".join(out)


def _builtin_gemma(msgs, add_gen):
    out = []
    for m in msgs:
        role = "model" if m["role"] == "assistant" else "user"
        out.append(f"<start_of_turn>{role}\n{m['content']}<end_of_turn>\n")
    if add_gen:
        out.append("<start_of_turn>model\n")
    return "".join(out)


def _builtin_phi3(msgs, add_gen):
    out = []
    for m in msgs:
        out.append(f"<|{m['role']}|>\n{m['content']}<|end|>\n")
    if add_gen:
        out.append("<|assistant|>\n")
    return "".join(out)


def _builtin_gpt_oss(msgs, add_gen):
    """Minimal harmony writer (gpt-oss): role header + message channel.
    System turns map to harmony's developer role."""
    out = []
    for m in msgs:
        role = "developer" if m["role"] == "system" else m["role"]
        out.append(f"<|start|>{role}<|message|>{m['content']}<|end|>")
    if add_gen:
        out.append("<|start|>assistant")
    return "".join(out)


_BUILTINS = {
    "chatml": _builtin_chatml,
    "llama3": _builtin_llama3,
    "llama4": _builtin_llama4,
    "llama2": _builtin_llama2,
    "mistral": _builtin_llama2,
    "gemma": _builtin_gemma,
    "phi3": _builtin_phi3,
    "gpt-oss": _builtin_gpt_oss,
}


class ChatTemplates:
    """Holds the model's chat template; applies jinja or builtin writers."""

    def __init__(self, tokenizer=None, template_override: str | None = None,
                 use_jinja: bool = True):
        self.source = template_override or (
            tokenizer.chat_template if tokenizer else None)
        self.alias = detect_alias(self.source)
        self.use_jinja = use_jinja and bool(self.source)
        self.bos_token = ""
        self.eos_token = ""
        if tokenizer is not None:
            if tokenizer.bos_id is not None:
                self.bos_token = tokenizer.vocab[tokenizer.bos_id]
            if tokenizer.eos_id is not None:
                self.eos_token = tokenizer.vocab[tokenizer.eos_id]
        self._compiled = None
        if self.use_jinja:
            try:
                self._compiled = _make_env().from_string(self.source)
            except jinja2.TemplateError as exc:
                SRV_WRN("chat", "template compile failed (%s); using builtin %s",
                        exc, self.alias)
                self.use_jinja = False

    def apply(self, messages: list[dict], tools: list | None = None,
              add_generation_prompt: bool = True,
              extra_context: dict | None = None) -> str:
        msgs = [ChatMessage(m) for m in messages]
        if self._compiled is not None:
            ctx: dict[str, Any] = {
                "messages": msgs,
                "add_generation_prompt": add_generation_prompt,
                "bos_token": self.bos_token,
                "eos_token": self.eos_token,
            }
            if tools:
                ctx["tools"] = tools
            if extra_context:
                ctx.update(extra_context)
            try:
                return self._compiled.render(**ctx)
            except jinja2.TemplateError as exc:
                SRV_WRN("chat", "template render failed (%s); using builtin %s",
                        exc, self.alias)
        writer = _BUILTINS.get(self.alias, _builtin_chatml)
        return writer(messages, add_generation_prompt)

    def example(self) -> str:
        return self.apply([
            {"role": "system", "content": "You are a helpful assistant"},
            {"role": "user", "content": "Hello"},
            {"role": "assistant", "content": "Hi there"},
            {"role": "user", "content": "How are you?"},
        ])
