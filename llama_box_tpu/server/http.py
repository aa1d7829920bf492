"""HTTP transport + routes (reference httpserver.hpp:3166-3327 transport,
5251-6273 handlers): aiohttp app, CORS + X-Request-ID middleware,
exception→JSON-error mapping, SSE streaming bridge pulling from per-task
result queues, capability-gated route registration.
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Any

from aiohttp import web

from ..sampling import SamplerParams
from ..utils.logging import SRV_ERR, SRV_INF
from ..utils.tokenbucket import RatelimitTokenBucket
from .chat import ChatTemplates
from .engine import Engine
from .reasoning import ReasoningSplitter, detect_reasoning_markers
from .toolcall import ToolCallScanner, migrate_functions, \
    tools_grammar
from .protocol import (
    RequestError, bad_request, chat_chunk_json, chat_completion_json,
    completion_chunk_json, completion_json, new_request_id, parse_lora,
    parse_max_tokens, parse_prompt_tokens, parse_sampling, parse_stop,
    parse_stream_options, usage_json,
)
from .task import CompletionsTask, EmbeddingsTask, ImagesTask, RerankTask

SSE_HEADERS = {
    "Content-Type": "text/event-stream",
    "Cache-Control": "no-cache",
    "Connection": "keep-alive",
}


class HTTPServer:
    def __init__(self, engine: Engine, model_name: str = "model",
                 defaults: SamplerParams | None = None,
                 chat_templates: ChatTemplates | None = None,
                 capabilities: dict | None = None,
                 max_tps: float = 0.0,
                 multimodal=None,
                 lora_adapters: list | None = None,
                 default_max_tokens: int = -1,
                 chat_template_kwargs: dict | None = None,
                 default_grammar: str | None = None,
                 default_stop: tuple = (),
                 image_defaults: dict | None = None):
        self.engine = engine
        self.model_name = model_name
        self.defaults = defaults or SamplerParams()
        self.default_grammar = default_grammar
        self.default_stop = tuple(default_stop)
        self.image_defaults = image_defaults or {}
        self.chat = chat_templates or ChatTemplates(engine.tokenizer)
        self.mp = multimodal  # MultimodalProcessor | None
        self.reasoning_markers = detect_reasoning_markers(self.chat.source)
        self.caps = {
            "completion": True, "embedding": True, "reranking": False,
            "image": False, "vision": False, "audio": False,
            "speculative": False, "tool_calls": self.chat.source is not None,
            "reasoning": self.reasoning_markers is not None,
        }
        if multimodal is not None:
            self.caps["vision"] = True
        if capabilities:
            self.caps.update(capabilities)
        self.max_tps = max_tps  # server decode-rate cap (0 = unlimited)
        self.lora_adapters = lora_adapters or []
        self.default_max_tokens = default_max_tokens  # -n server default
        self.chat_template_kwargs = chat_template_kwargs or {}
        self.created = int(time.time())

    def _request_rate_bucket(self, request: web.Request):
        """X-Request-Tokens-Per-Second -> per-task token bucket; 410 when
        the requested rate exceeds the server cap (httpserver.hpp:5682)."""
        hdr = request.headers.get("X-Request-Tokens-Per-Second")
        tps = self.max_tps
        if hdr is not None:
            try:
                tps = float(hdr)
            except ValueError:
                raise bad_request(
                    "\"X-Request-Tokens-Per-Second\" must be a number")
            if tps <= 0:
                tps = self.max_tps
            elif self.max_tps > 0 and tps > self.max_tps:
                raise RequestError(
                    410, "requested tokens per second exceeds the server "
                    f"limit ({self.max_tps:.0f})", code="rate_limit")
        if tps and tps > 0:
            return RatelimitTokenBucket(capacity=max(int(tps), 1), rate=tps)
        return None

    # -- app construction ----------------------------------------------------

    def build_app(self) -> web.Application:
        app = web.Application(middlewares=[self._middleware],
                              client_max_size=512 * 1024 * 1024)
        r = app.router
        r.add_get("/health", self.handle_health)
        r.add_get("/metrics", self.handle_metrics)
        r.add_get("/v1/models", self.handle_models)
        r.add_get("/models", self.handle_models)
        r.add_get("/lora-adapters", self.handle_lora_adapters)
        r.add_post("/tokenize", self.handle_tokenize)
        r.add_post("/detokenize", self.handle_detokenize)
        if self.caps["completion"]:
            r.add_post("/v1/completions", self.handle_completions)
            r.add_post("/completions", self.handle_completions)
            r.add_post("/v1/chat/completions", self.handle_chat_completions)
            r.add_post("/chat/completions", self.handle_chat_completions)
        if self.caps["embedding"]:
            r.add_post("/v1/embeddings", self.handle_embeddings)
            r.add_post("/embeddings", self.handle_embeddings)
        if self.caps["reranking"]:
            r.add_post("/v1/rerank", self.handle_rerank)
            r.add_post("/rerank", self.handle_rerank)
        if self.caps["image"]:
            r.add_post("/v1/images/generations", self.handle_images)
            r.add_post("/v1/images/edits", self.handle_images_edits)
        return app

    @web.middleware
    async def _middleware(self, request: web.Request, handler):
        rid = request.headers.get("X-Request-ID", new_request_id())
        request["rid"] = rid
        t0 = time.monotonic()
        try:
            if request.method == "OPTIONS":
                resp = web.Response(status=200)
            else:
                resp = await handler(request)
        except RequestError as exc:
            resp = web.json_response(exc.to_json(), status=exc.status)
        except web.HTTPException:
            raise
        except (asyncio.CancelledError, ConnectionResetError):
            raise
        except Exception as exc:  # noqa: BLE001
            SRV_ERR("http", "rid=%s unhandled: %r", rid, exc)
            resp = web.json_response(
                RequestError(500, str(exc) or "internal error",
                             err_type="server_error").to_json(), status=500)
        resp.headers["X-Request-ID"] = rid
        resp.headers["Access-Control-Allow-Origin"] = "*"
        resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
        resp.headers["Access-Control-Allow-Headers"] = "*"
        SRV_INF("http", "rid=%s %s %s %d %.1fms", rid, request.method,
                request.path, resp.status, (time.monotonic() - t0) * 1e3)
        return resp

    async def _body(self, request: web.Request) -> dict:
        try:
            body = await request.json()
        except Exception:
            raise bad_request("request body must be valid JSON")
        if not isinstance(body, dict):
            raise bad_request("request body must be a JSON object")
        return body

    # -- meta endpoints ------------------------------------------------------

    async def handle_health(self, request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def handle_models(self, request: web.Request) -> web.Response:
        cfg = self.engine.cfg
        return web.json_response({
            "object": "list",
            "data": [{
                "id": self.model_name,
                "object": "model",
                "created": self.created,
                "owned_by": "llama-box",
                "meta": {
                    "vocab_type": 1,
                    "n_vocab": cfg.vocab_size,
                    "n_ctx_train": cfg.n_ctx_train,
                    "n_embd": cfg.n_embd,
                    "n_params": self._n_params(),
                    "size": self._param_bytes(),
                    "support_completion": self.caps["completion"],
                    "support_embedding": self.caps["embedding"],
                    "support_reranking": self.caps["reranking"],
                    "support_image": self.caps["image"],
                    "support_vision": self.caps["vision"],
                    "support_audio": self.caps["audio"],
                    "support_speculative": self.caps["speculative"],
                    "support_tool_calls": self.caps["tool_calls"],
                    "support_reasoning": self.caps["reasoning"],
                },
            }],
        })

    def _n_params(self):
        import jax
        try:
            return int(sum(x.size for x in jax.tree.leaves(
                self.engine.params or {})))
        except Exception:  # noqa: BLE001
            return None

    def _param_bytes(self):
        import jax
        try:
            return int(sum(x.size * x.dtype.itemsize
                           for x in jax.tree.leaves(
                               self.engine.params or {})))
        except Exception:  # noqa: BLE001
            return None

    async def handle_lora_adapters(self, request: web.Request) -> web.Response:
        return web.json_response(self.lora_adapters)

    async def handle_metrics(self, request: web.Request) -> web.Response:
        m = self.engine.metrics
        used, total = self.engine.kv_cache_usage()
        processing = sum(1 for s in self.engine.slots if s.state != "idle")
        lines = []

        def counter(name, help_, value):
            lines.append(f"# HELP llamabox:{name} {help_}")
            lines.append(f"# TYPE llamabox:{name} counter")
            lines.append(f"llamabox:{name} {value}")

        def gauge(name, help_, value):
            lines.append(f"# HELP llamabox:{name} {help_}")
            lines.append(f"# TYPE llamabox:{name} gauge")
            lines.append(f"llamabox:{name} {value}")

        counter("prompt_tokens_total", "Number of prompt tokens processed.",
                m.n_prefill_total)
        counter("prompt_seconds_total", "Prompt process time.",
                round(m.t_prefill_total_ms / 1e3, 3))
        counter("tokens_predicted_total", "Number of generated tokens.",
                m.n_decode_total)
        counter("tokens_predicted_seconds_total", "Generation time.",
                round(m.t_decode_total_ms / 1e3, 3))
        counter("tokens_drafted_total", "Number of drafted tokens.",
                m.n_drafted_total)
        counter("tokens_drafted_accepted_total",
                "Number of accepted drafted tokens.",
                m.n_drafted_accepted_total)
        counter("requests_total", "Number of requests.", m.n_requests)
        pps = (m.n_prefill_total / (m.t_prefill_total_ms / 1e3)
               if m.t_prefill_total_ms > 0 else 0.0)
        dps = (m.n_decode_total / (m.t_decode_total_ms / 1e3)
               if m.t_decode_total_ms > 0 else 0.0)
        gauge("prompt_tokens_seconds", "Average prompt throughput (tok/s).",
              round(pps, 2))
        gauge("predicted_tokens_seconds",
              "Average generation throughput (tok/s).", round(dps, 2))
        gauge("kv_cache_usage_ratio", "KV-cache usage; 1 means full.",
              round(used / max(total, 1), 4))
        gauge("kv_cache_tokens", "KV-cache tokens.", used)
        gauge("requests_processing", "Number of requests processing.",
              processing)
        gauge("requests_deferred", "Number of requests deferred.",
              self.engine.queue.qsize())
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    # -- tokenize ------------------------------------------------------------

    async def handle_tokenize(self, request: web.Request) -> web.Response:
        body = await self._body(request)
        if "content" not in body:
            raise bad_request("\"content\" must be provided", "content")
        add_special = bool(body.get("add_special", True))
        tok = self.engine.tokenizer
        ids = parse_prompt_tokens(body["content"], tok, "content") \
            if not isinstance(body["content"], str) else tok.encode(
                body["content"], add_special=add_special, parse_special=True)
        if body.get("with_pieces"):
            out = [{"id": t, "piece": tok.decode([t], skip_leading_space=False)}
                   for t in ids]
            return web.json_response({"tokens": out})
        return web.json_response({"tokens": ids})

    async def handle_detokenize(self, request: web.Request) -> web.Response:
        body = await self._body(request)
        toks = body.get("tokens")
        if not isinstance(toks, list) or not all(
                isinstance(t, int) and not isinstance(t, bool) for t in toks):
            raise bad_request("\"tokens\" must be an array of token ids",
                              "tokens")
        text = self.engine.tokenizer.decode(toks)
        return web.json_response({"content": text})

    # -- completions ---------------------------------------------------------

    def _submit(self, task) -> None:
        """Attach the asyncio result bridge BEFORE the engine can emit, then
        hand the task to the reconcile thread."""
        task.attach_aio(asyncio.get_event_loop(), asyncio.Queue())
        self.engine.submit(task)

    async def _await_event(self, task, timeout: float = 600.0):
        if task._aio_q is not None:
            return await asyncio.wait_for(task._aio_q.get(), timeout)
        loop = asyncio.get_event_loop()
        return await loop.run_in_executor(None, task.result_q.get, True,
                                          timeout)

    async def handle_completions(self, request: web.Request) -> web.Response:
        body = await self._body(request)
        tok = self.engine.tokenizer
        if "prompt" not in body:
            raise bad_request("\"prompt\" must be provided", "prompt")
        prompt_tokens = parse_prompt_tokens(body["prompt"], tok)
        if not prompt_tokens:
            raise bad_request("\"prompt\" must not be empty", "prompt")
        sparams = parse_sampling(body, self.defaults, tok.n_vocab,
                                 default_grammar=self.default_grammar)
        so = parse_stream_options(body)
        mt = parse_max_tokens(body, self.engine.slot_ctx)
        task = CompletionsTask(
            prompt_tokens, sparams, tokenizer=tok,
            max_tokens=mt if mt > 0 else self.default_max_tokens,
            stop_words=parse_stop(body, self.default_stop),
            stream=so["stream"],
            n_keep=int(body.get("n_keep", 0)),
            n_probs=sparams.n_probs,
            rid=request["rid"],
            rate_bucket=self._request_rate_bucket(request),
            lora=parse_lora(body, self.engine.n_lora),
        )
        self._submit(task)
        if not so["stream"]:
            return await self._blocking_response(
                task, lambda t: completion_json(t, self.model_name))
        return await self._stream_response(
            request, task, so,
            chunk_fn=lambda t, d, fr: completion_chunk_json(
                t, self.model_name, d.get("text", ""), fr))

    async def handle_chat_completions(self, request: web.Request
                                      ) -> web.Response:
        body = await self._body(request)
        tok = self.engine.tokenizer
        messages = body.get("messages")
        if not isinstance(messages, list) or not messages:
            raise bad_request("\"messages\" must be a non-empty array",
                              "messages")
        msgs, images = self._normalize_messages(messages)
        tools, tool_choice = migrate_functions(body)
        if tools is not None and not isinstance(tools, list):
            raise bad_request("\"tools\" must be an array", "tools")
        use_tools = bool(tools) and tool_choice != "none"
        extra_ctx = dict(self.chat_template_kwargs)
        ck = body.get("chat_template_kwargs")
        if isinstance(ck, dict):
            extra_ctx.update(ck)
        prompt = self.chat.apply(msgs, tools=tools if use_tools else None,
                                 add_generation_prompt=True,
                                 extra_context=extra_ctx or None)
        chunks = None
        mrope_delta = 0
        if images:
            from .multimodal import (build_chunks, build_chunks_mrope,
                                     scaffold_prompt)
            prompt = scaffold_prompt(
                prompt, self.engine.cfg.arch, media=images,
                audio_family=getattr(self.mp, "audio_family", None))
            try:
                if self.engine.cfg.mrope_sections:
                    side = self.mp.cfg.n_patches_side // max(
                        self.mp.cfg.merge_size, 1)
                    grids = [(side, side)] * len(images)
                    prompt_tokens, chunks, mrope_delta = build_chunks_mrope(
                        prompt, images, tok, self.mp, grids)
                else:
                    prompt_tokens, chunks = build_chunks(prompt, images, tok,
                                                         self.mp)
            except ValueError as exc:
                raise bad_request(str(exc), "messages")
            max_len = self.engine.slot_ctx - self.engine.ecfg.defrag_headroom
            if len(prompt_tokens) > max_len:
                raise bad_request(
                    f"multimodal prompt is {len(prompt_tokens)} tokens but "
                    f"the per-slot context allows {max_len}", "messages")
        else:
            prompt_tokens = tok.encode(prompt, add_special=True,
                                       parse_special=True)
        sparams = parse_sampling(body, self.defaults, tok.n_vocab,
                                 default_grammar=self.default_grammar)
        so = parse_stream_options(body)
        reasoning = None
        if self.reasoning_markers is not None:
            reasoning = ReasoningSplitter(*self.reasoning_markers,
                                          force_open=prompt.rstrip().endswith(
                                              self.reasoning_markers[0]))
        mt = parse_max_tokens(body, self.engine.slot_ctx)
        if use_tools and sparams.grammar is None:
            tg = tools_grammar(tools, self.chat.alias)
            if tg is not None:
                import dataclasses as _dc

                from ..grammar import Grammar, GrammarError
                try:
                    sparams = _dc.replace(
                        sparams, grammar=Grammar(tg[0]), grammar_lazy=True,
                        grammar_triggers=tg[1])
                except GrammarError:
                    pass   # malformed tool schema: fall back to scanning
        task = CompletionsTask(
            prompt_tokens, sparams, tokenizer=tok,
            max_tokens=mt if mt > 0 else self.default_max_tokens,
            stop_words=parse_stop(body, self.default_stop),
            stream=so["stream"],
            n_probs=sparams.n_probs,
            rid=request["rid"],
            reasoning=reasoning,
            toolscan=(ToolCallScanner(
                self.chat.alias,
                parallel=bool(body.get("parallel_tool_calls", True)))
                if use_tools else None),
            rate_bucket=self._request_rate_bucket(request),
            chunks=chunks,
            lora=parse_lora(body, self.engine.n_lora),
        )
        task.mrope_delta = mrope_delta
        self._submit(task)
        if not so["stream"]:
            def render(t):
                extra = {}
                if t.tool_calls:
                    extra["tool_calls"] = [
                        {"id": c.id, "type": "function",
                         "function": {"name": c.name,
                                      "arguments": c.arguments}}
                        for c in t.tool_calls]
                if t.reasoning_text:
                    extra["reasoning_content"] = t.reasoning_text
                return chat_completion_json(t, self.model_name, tok, extra)
            return await self._blocking_response(task, render)

        first = {"role": "assistant", "content": ""}
        n_calls = 0

        def chunk_fn(t, d, fr):
            nonlocal first, n_calls
            delta: dict[str, Any] = {}
            if first is not None:
                delta.update(first)
                first = None
            if d.get("text"):
                delta["content"] = delta.get("content", "") + d["text"]
            if d.get("reasoning_content"):
                delta["reasoning_content"] = d["reasoning_content"]
            if d.get("tool_calls"):
                delta["tool_calls"] = []
                for c in d["tool_calls"]:
                    delta["tool_calls"].append(
                        {"index": n_calls, "id": c.id, "type": "function",
                         "function": {"name": c.name,
                                      "arguments": c.arguments}})
                    n_calls += 1
            return chat_chunk_json(t, self.model_name, delta, fr)

        return await self._stream_response(request, task, so, chunk_fn)

    def _normalize_messages(self, messages: list
                            ) -> tuple[list[dict], list[bytes]]:
        from .multimodal import MTMD_MARKER, fetch_image_bytes
        out = []
        images: list[bytes] = []
        for i, m in enumerate(messages):
            if not isinstance(m, dict):
                raise bad_request(f"messages[{i}] must be an object",
                                  "messages")
            role = m.get("role")
            if role not in ("system", "user", "assistant", "tool",
                            "developer"):
                raise bad_request(f"messages[{i}].role is invalid", "messages")
            content = m.get("content")
            if isinstance(content, list):
                parts = []
                for p in content:
                    if not isinstance(p, dict):
                        raise bad_request(
                            f"messages[{i}].content parts must be objects",
                            "messages")
                    ptype = p.get("type")
                    if ptype == "text":
                        parts.append(p.get("text", ""))
                    elif ptype == "image_url" and self.mp is not None:
                        url = (p.get("image_url") or {}).get("url", "")
                        try:
                            images.append(("image", fetch_image_bytes(url)))
                        except Exception as exc:  # noqa: BLE001
                            raise bad_request(
                                f"messages[{i}] image fetch failed: {exc}",
                                "messages")
                        parts.append(MTMD_MARKER)
                    elif ptype == "input_audio" and self.mp is not None \
                            and self.mp.supports_audio:
                        ia = p.get("input_audio") or {}
                        fmt = ia.get("format", "wav")
                        ok_fmts = ("wav",)
                        from ..utils import mp3 as _mp3
                        if _mp3.available():
                            ok_fmts = ("wav", "mp3")
                        if fmt not in ok_fmts:
                            raise bad_request(
                                f"messages[{i}] audio format \"{fmt}\" is "
                                f"not supported ({'/'.join(ok_fmts)} only)",
                                "messages")
                        import base64 as _b64
                        try:
                            images.append(("audio",
                                           _b64.b64decode(ia.get("data", ""))))
                        except Exception as exc:  # noqa: BLE001
                            raise bad_request(
                                f"messages[{i}] audio decode failed: {exc}",
                                "messages")
                        parts.append(MTMD_MARKER)
                    else:
                        raise bad_request(
                            f"messages[{i}].content type \"{ptype}\" is not "
                            "supported by this model", "messages")
                content = "".join(parts)
            elif content is None:
                if m.get("tool_calls") is None:
                    # reference: httpserver.hpp:1155-1157
                    raise bad_request(
                        f"messages[{i}] is missing 'content' or "
                        "'tool_calls'", "messages")
                content = ""
            elif not isinstance(content, str):
                raise bad_request(f"messages[{i}].content is invalid",
                                  "messages")
            nm = {"role": "system" if role == "developer" else role,
                  "content": content}
            for k in ("name", "tool_calls", "tool_call_id"):
                if k in m:
                    nm[k] = m[k]
            out.append(nm)
        return out, images

    async def _blocking_response(self, task, render) -> web.Response:
        while True:
            kind, payload = await self._await_event(task)
            if kind == "error":
                raise payload if isinstance(payload, RequestError) else \
                    RequestError(500, str(payload), err_type="server_error")
            if kind == "final":
                return web.json_response(render(payload))
            # non-streaming: drop deltas

    async def _stream_response(self, request, task, so, chunk_fn
                               ) -> web.StreamResponse:
        resp = web.StreamResponse(status=200, headers=dict(SSE_HEADERS))
        await resp.prepare(request)

        async def send(obj) -> None:
            await resp.write(b"data: " + json.dumps(
                obj, ensure_ascii=False).encode() + b"\n\n")

        try:
            while True:
                kind, payload = await self._await_event(task)
                if kind == "error":
                    err = payload.to_json() if isinstance(payload, RequestError) \
                        else RequestError(500, str(payload),
                                          err_type="server_error").to_json()
                    await resp.write(b"error: " + json.dumps(err).encode()
                                     + b"\n\n")
                    break
                if kind == "delta":
                    fr = payload.get("finish_reason")
                    await send(chunk_fn(task, payload, fr))
                elif kind == "final":
                    if so.get("include_usage"):
                        final_chunk = chunk_fn(task, {}, None)
                        final_chunk["choices"] = []
                        final_chunk["usage"] = usage_json(payload)
                        await send(final_chunk)
                    await resp.write(b"data: [DONE]\n\n")
                    break
        except (asyncio.CancelledError, ConnectionResetError):
            task.cancelled = True
            raise
        await resp.write_eof()
        return resp

    # -- embeddings / rerank -------------------------------------------------

    async def handle_embeddings(self, request: web.Request) -> web.Response:
        body = await self._body(request)
        tok = self.engine.tokenizer
        inp = body.get("input", body.get("content"))
        if inp is None:
            raise bad_request("\"input\" must be provided", "input")
        if isinstance(inp, str) or (
                isinstance(inp, list) and inp
                and all(isinstance(x, int) and not isinstance(x, bool)
                        for x in inp)):
            inputs = [inp]
        elif isinstance(inp, list) and inp:
            inputs = inp
        else:
            raise bad_request("\"input\" must be a string, array of strings, "
                              "or token arrays", "input")
        token_lists = [parse_prompt_tokens(x, tok, "input") for x in inputs]
        for i, t in enumerate(token_lists):
            if not t:
                raise bad_request(f"\"input\"[{i}] must not be empty", "input")

        enc = body.get("encoding_format", "float")
        if enc not in ("float", "base64"):
            raise bad_request("\"encoding_format\" must be \"float\" or "
                              "\"base64\"", "encoding_format")
        task = EmbeddingsTask(token_lists, rid=request["rid"])
        self._submit(task)
        kind, payload = await self._await_event(task)
        if kind == "error":
            raise RequestError(500, str(payload), err_type="server_error")
        if enc == "base64":
            import base64 as _b64

            import numpy as _np
            data = [{"object": "embedding", "index": i,
                     "embedding": _b64.b64encode(
                         _np.asarray(e, _np.float32).tobytes()).decode()}
                    for i, e in enumerate(payload.embeddings)]
        else:
            data = [{"object": "embedding", "index": i, "embedding": e}
                    for i, e in enumerate(payload.embeddings)]
        return web.json_response({
            "object": "list",
            "data": data,
            "model": self.model_name,
            "usage": {"prompt_tokens": task.n_prompt,
                      "total_tokens": task.n_prompt},
        })

    async def handle_images(self, request: web.Request) -> web.Response:
        body = await self._body(request)
        task = _images_task_from_body(body, request["rid"],
                                      defaults=self.image_defaults)
        return await self._images_response(request, task)

    async def handle_images_edits(self, request: web.Request) -> web.Response:
        """multipart: image (+ optional mask) + prompt fields (reference
        image-edit pipeline httpserver.hpp:1913-2037)."""
        import io

        import numpy as np
        if not (request.content_type or "").startswith("multipart/"):
            raise bad_request("image edits require multipart/form-data")
        form = await request.post()
        body = {k: form[k] for k in form if not hasattr(form[k], "file")}
        for k in ("n", "sampling_steps", "sample_steps", "steps", "seed"):
            if k in body:
                try:
                    body[k] = int(body[k])
                except ValueError:
                    raise bad_request(f"\"{k}\" is invalid", k)
        for k in ("cfg_scale", "strength"):
            if k in body:
                try:
                    body[k] = float(body[k])
                except ValueError:
                    raise bad_request(f"\"{k}\" is invalid", k)
        if "stream" in body:
            body["stream"] = str(body["stream"]).lower() in ("1", "true")
        img_field = form.get("image")
        if img_field is None or not hasattr(img_field, "file"):
            raise bad_request("\"image\" file must be provided", "image")
        from PIL import Image
        w, h = _parse_size(body.get("size"))
        img = Image.open(io.BytesIO(img_field.file.read())).convert("RGB")
        img = img.resize((w, h), Image.BICUBIC)
        init_image = np.asarray(img, np.float32) / 255.0
        mask = None
        mask_field = form.get("mask")
        if mask_field is not None and hasattr(mask_field, "file"):
            m = Image.open(io.BytesIO(mask_field.file.read())).convert("L")
            mask = np.asarray(m.resize((w, h), Image.BILINEAR),
                              np.float32) / 255.0
        control = None
        ctl_field = form.get("control")
        if ctl_field is not None and hasattr(ctl_field, "file"):
            c = Image.open(io.BytesIO(ctl_field.file.read())).convert("RGB")
            control = np.asarray(c.resize((w, h), Image.BICUBIC),
                                 np.float32) / 255.0
            if self.image_defaults.get("control_canny"):
                from ..diffusion.controlnet import canny
                control = canny(control)
        task = _images_task_from_body(dict(body), request["rid"],
                                      init_image=init_image, mask=mask,
                                      control=control,
                                      defaults=self.image_defaults)
        return await self._images_response(request, task)

    async def _images_response(self, request, task: ImagesTask):
        import base64 as _b64
        self._submit(task)
        created = int(time.time())
        so = getattr(task, "stream_options", None) or {
            "include_usage": True, "chunk_result": False,
            "chunk_size": 4096, "preview": False}

        def item(idx, prog_done, prog_total, b64, stop):
            """One data[] entry (reference images_task::to_json,
            httpserver.hpp:2560-2574)."""
            return {"index": idx, "object": "image",
                    "progressed_steps": prog_done,
                    "progress_steps": prog_total,
                    "progress": (100.0 if stop else
                                 round(100.0 * prog_done
                                       / max(prog_total, 1), 2)),
                    "finish_reason": "stop" if stop else None,
                    "b64_json": b64}

        if not task.stream:
            while True:
                kind, payload = await self._await_event(task, timeout=3600)
                if kind == "error":
                    raise RequestError(500, str(payload),
                                       err_type="server_error")
                if kind == "final":
                    steps = task.gp.steps
                    return web.json_response({
                        "created": created,
                        "model": self.model_name,
                        "object": "list",
                        "data": [item(i, steps, steps,
                                      _b64.b64encode(png).decode(), True)
                                 for i, png in enumerate(payload.images)],
                        "usage": payload.usage(),
                    })
        resp = web.StreamResponse(status=200, headers=dict(SSE_HEADERS))
        await resp.prepare(request)

        async def send_item(it, usage=None):
            """Emit one image item, split into chunk_size b64 chunks when
            chunk_result — progress interpolates within the step like the
            reference bridge (httpserver.hpp:5068-5100)."""
            base = {"created": created, "model": self.model_name,
                    "object": "list", "usage": usage}
            b64 = it["b64_json"]
            csz = int(so["chunk_size"])
            if not so.get("chunk_result") or not b64 or len(b64) <= csz:
                await resp.write(b"data: " + json.dumps(
                    {**base, "data": [it]}).encode() + b"\n\n")
                return
            n_chunks = len(b64) // csz + 1
            p_base = (it["progressed_steps"] - 1) / max(
                it["progress_steps"], 1)
            p_scale = 1.0 / max(it["progress_steps"], 1)
            for ci in range(0, len(b64), csz):
                part = dict(it)
                part["b64_json"] = b64[ci:ci + csz]
                part["progress"] = round(
                    100.0 * (p_base + (ci // csz + 1) / n_chunks * p_scale),
                    2)
                await resp.write(b"data: " + json.dumps(
                    {**base, "data": [part]}).encode() + b"\n\n")

        try:
            while True:
                kind, payload = await self._await_event(task, timeout=3600)
                if kind == "error":
                    err = RequestError(500, str(payload),
                                       err_type="server_error").to_json()
                    await resp.write(b"error: " + json.dumps(err).encode()
                                     + b"\n\n")
                    break
                if kind == "progress":
                    b64 = ""
                    if "preview" in payload:
                        import io as _io

                        from PIL import Image as _Image
                        buf = _io.BytesIO()
                        _Image.fromarray(payload["preview"]).save(
                            buf, format="PNG")
                        b64 = _b64.b64encode(buf.getvalue()).decode()
                    await send_item(item(payload["index"], payload["step"],
                                         payload["total_steps"], b64, False))
                elif kind == "final":
                    steps = task.gp.steps
                    last = len(payload.images) - 1
                    for i, png in enumerate(payload.images):
                        usage = (payload.usage()
                                 if i == last and so.get("include_usage",
                                                         True) else None)
                        await send_item(
                            item(i, steps, steps,
                                 _b64.b64encode(png).decode(), True),
                            usage=usage)
                    await resp.write(b"data: [DONE]\n\n")
                    break
        except (asyncio.CancelledError, ConnectionResetError):
            task.cancelled = True
            raise
        await resp.write_eof()
        return resp

    async def handle_rerank(self, request: web.Request) -> web.Response:
        body = await self._body(request)
        tok = self.engine.tokenizer
        query = body.get("query")
        docs = body.get("documents")
        if not isinstance(query, str) or not query:
            raise bad_request("\"query\" must be a non-empty string", "query")
        if not isinstance(docs, list) or not docs or not all(
                isinstance(d, str) for d in docs):
            raise bad_request("\"documents\" must be a non-empty array of "
                              "strings", "documents")
        top_n = body.get("top_n", len(docs))
        normalize = bool(body.get("normalize", True))

        def pair(q: str, d: str) -> list[int]:
            """[BOS/CLS] q [SEP] d [SEP] [EOS] (httpserver.hpp:6189-6231)."""
            q_ids = tok.encode(q, add_special=False)
            d_ids = tok.encode(d, add_special=False)
            cls = getattr(tok, "cls_id", None)
            bos = [cls] if cls is not None else (
                [tok.bos_id] if tok.bos_id is not None else [])
            sep = [tok.sep_id] if tok.sep_id is not None else (
                [tok.eos_id] if tok.eos_id is not None else [])
            eos = [] if tok.sep_id is not None and tok.eos_id is None else (
                [tok.eos_id] if tok.eos_id is not None else [])
            return bos + q_ids + sep + d_ids + sep + eos

        pairs = [pair(query, d) for d in docs]
        if normalize:
            pairs.append(pair(query, query))      # query-self anchor
            pairs.append(pair(query, "unknown"))  # query-unknown anchor
        task = RerankTask(pairs, n_documents=len(docs), normalize=normalize,
                          rid=request["rid"])
        self._submit(task)
        kind, payload = await self._await_event(task)
        if kind == "error":
            raise RequestError(500, str(payload), err_type="server_error")
        results = sorted(
            [{"index": i, "relevance_score": s,
              "document": {"text": docs[i]} if body.get("return_documents")
              else None}
             for i, s in enumerate(payload.scores)],
            key=lambda r: -r["relevance_score"])[:top_n]
        for r in results:
            if r["document"] is None:
                del r["document"]
        return web.json_response({
            "model": self.model_name,
            "results": results,
            "usage": {"prompt_tokens": task.n_prompt,
                      "total_tokens": task.n_prompt},
        })


def _parse_size(size, param="size"):
    if size is None:
        return 512, 512
    try:
        w, h = str(size).lower().split("x")
        w, h = int(w), int(h)
    except ValueError:
        raise bad_request(f"\"{param}\" must look like \"512x512\"", param)
    if w % 64 or h % 64 or not (64 <= w <= 2048 and 64 <= h <= 2048):
        raise bad_request(f"\"{param}\" must be multiples of 64 within "
                          "64..2048", param)
    return w, h


def _images_task_from_body(body: dict, rid: str, init_image=None,
                           mask=None, control=None,
                           defaults: dict | None = None) -> ImagesTask:
    """defaults: server-side --image-* knobs (sampler/steps/cfg_scale/
    strength/schedule/max_batch/max_width/max_height)."""
    from ..diffusion import GenerationParams
    d = defaults or {}
    prompt = body.get("prompt")
    if not isinstance(prompt, str) or not prompt:
        raise bad_request("\"prompt\" must be a non-empty string", "prompt")
    n_cap = int(d.get("max_batch", 8))
    n = body.get("n", 1)
    if not isinstance(n, int) or isinstance(n, bool) or not 1 <= n <= n_cap:
        raise bad_request(f"\"n\" must be an integer in 1..{n_cap}", "n")
    rf = body.get("response_format", "b64_json")
    if rf not in ("b64_json",):
        raise bad_request("only \"b64_json\" response_format is supported",
                          "response_format")
    w, h = _parse_size(body.get("size"))
    max_w, max_h = int(d.get("max_width", 2048)), int(d.get("max_height",
                                                            2048))
    if w > max_w or h > max_h:
        raise bad_request(f"\"size\" exceeds the server limit "
                          f"{max_w}x{max_h}", "size")
    sampler = body.get("sampler", body.get("sample_method",
                                           d.get("sampler", "euler")))
    from ..diffusion.scheduler import SAMPLERS, resolve_sampler
    if sampler not in SAMPLERS:
        try:
            mapped = resolve_sampler(str(sampler))
        except ValueError as exc:
            raise bad_request(str(exc), "sampler")
        SRV_INF("images", "sampler %r -> %r", sampler, mapped)
        sampler = mapped
    seed = body.get("seed")
    if seed is None or not isinstance(seed, int) or seed < 0:
        seed = int(time.time_ns() & 0xFFFFFFFF)
    gp = GenerationParams(
        prompt=prompt,
        negative_prompt=str(body.get("negative_prompt", "")),
        width=w, height=h,
        # accepted spellings: sampling_steps > sample_steps > steps
        # (reference parser httpserver.hpp:243-249)
        steps=max(1, min(int(body.get("sampling_steps",
                                      body.get("sample_steps",
                                               body.get("steps",
                                                        d.get("steps",
                                                              20))))), 150)),
        cfg_scale=float(body.get("cfg_scale", d.get("cfg_scale", 7.0))),
        sampler=sampler,
        seed=seed,
        strength=float(body.get("strength", d.get("strength", 0.75))),
        schedule=str(body.get("schedule", d.get("schedule", ""))),
    )
    if control is None and isinstance(body.get("control_image"), str):
        # JSON API extension: base64 control image for txt2img ControlNet
        import base64 as _b64
        import io as _io

        import numpy as np
        from PIL import Image as _Image
        try:
            raw = _b64.b64decode(body["control_image"])
            ci = _Image.open(_io.BytesIO(raw)).convert("RGB")
        except Exception:
            raise bad_request("\"control_image\" must be base64 image "
                              "data", "control_image")
        control = np.asarray(ci.resize((w, h), _Image.BICUBIC),
                             np.float32) / 255.0
        if d.get("control_canny"):
            from ..diffusion.controlnet import canny
            control = canny(control)
    # stream options: JSON nested object {"preview","chunk_result",
    # "chunk_size","include_usage"} or multipart-flattened
    # stream_options_* fields (reference image_req defaults,
    # httpserver.hpp:1546-1552, multipart mapping :1818-1844)
    so_defaults = {"include_usage": True, "chunk_result": False,
                   "chunk_size": 4096, "preview": False}
    so_in = body.get("stream_options")
    if so_in is not None and not isinstance(so_in, dict):
        raise bad_request("\"stream_options\" must be an object",
                          "stream_options")
    so = dict(so_defaults, **(so_in or {}))
    for k in ("preview", "chunk_result", "include_usage"):
        flat = body.get(f"stream_options_{k}")
        if flat is not None:
            so[k] = str(flat).lower() in ("1", "true")
    flat = body.get("stream_options_chunk_size")
    if flat is not None:
        try:
            so["chunk_size"] = int(flat)
        except ValueError:
            raise bad_request("\"stream_options_chunk_size\" is invalid",
                              "stream_options_chunk_size")
    so["chunk_size"] = max(256, int(so.get("chunk_size") or 4096))
    preview = bool(body.get("preview", False)) or bool(so["preview"])
    task = ImagesTask(gp, n=n, stream=bool(body.get("stream", False)),
                      preview=preview,
                      init_image=init_image, mask=mask, control=control,
                      rid=rid)
    task.stream_options = so
    up = body.get("upscale", 1)
    if not isinstance(up, int) or isinstance(up, bool) or up not in (1, 2, 4):
        raise bad_request("\"upscale\" must be 1, 2 or 4", "upscale")
    task.upscale = up
    return task


async def run_app(server: HTTPServer, host: str = "0.0.0.0", port: int = 8080):
    app = server.build_app()
    runner = web.AppRunner(app)
    await runner.setup()
    if host.endswith(".sock"):
        site = web.UnixSite(runner, host)
    else:
        site = web.TCPSite(runner, host, port, backlog=512)
    await site.start()
    SRV_INF("http", "listening on %s:%s", host, port)
    return runner
