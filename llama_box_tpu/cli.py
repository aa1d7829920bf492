"""CLI/config system + main entry (reference engine_param.hpp: 183 flags in
groups general/server/completion/speculative/multimodal/embedding/images/
rpc-server; engine.cpp main dispatch).

Flag names match the reference's so existing llama-box deployments can reuse
their command lines. Flags whose semantics don't apply on TPU (e.g. CUDA
device splits) are accepted-and-mapped or accepted-and-ignored with a
warning, never a hard error.
"""

from __future__ import annotations

import argparse
import asyncio
import signal
import sys

from .sampling import SamplerParams
from .utils.logging import SRV_INF, SRV_WRN, set_verbosity

VERSION = "0.1.0"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="llama-box-tpu",
        description="TPU-native OpenAI-compatible inference server "
                    "(JAX/XLA/Pallas)")

    g = p.add_argument_group("general")
    g.add_argument("--version", action="store_true")
    g.add_argument("-v", "--verbose", action="count", default=0)
    g.add_argument("-lv", "--log-verbosity", type=int, default=0)
    g.add_argument("--system-info", action="store_true")
    g.add_argument("--list-devices", action="store_true")

    g = p.add_argument_group("server")
    g.add_argument("--host", default="127.0.0.1")
    g.add_argument("--port", type=int, default=8080)
    g.add_argument("-to", "--timeout", type=int, default=600,
                   help="server read/write timeout in seconds")
    g.add_argument("--threads-http", "-np", "--parallel", dest="n_parallel",
                   type=int, default=4,
                   help="number of parallel slots (= HTTP worker semantics "
                        "of the reference)")
    g.add_argument("--metrics", action="store_true", default=True)
    g.add_argument("--no-prompt-cache", dest="prompt_cache",
                   action="store_false", default=True)
    g.add_argument("-tps", "--tokens-per-second", type=float, default=0.0,
                   help="max decode rate per request; -1 probes at startup")
    g.add_argument("--alias", "--model-alias", dest="alias", default=None)

    g = p.add_argument_group("model")
    g.add_argument("-m", "--model", required=False,
                   help="path to the GGUF model")
    g.add_argument("-c", "--ctx-size", dest="n_ctx", type=int, default=8192)
    g.add_argument("-ub", "--ubatch-size", dest="n_ubatch", type=int,
                   default=512)
    g.add_argument("-b", "--batch-size", dest="n_batch", type=int,
                   default=2048)
    g.add_argument("-ctk", "--cache-type-k", default="bf16",
                   choices=["f32", "f16", "bf16", "q8_0", "int8"])
    g.add_argument("-ctv", "--cache-type-v", default="bf16",
                   choices=["f32", "f16", "bf16", "q8_0", "int8"])
    g.add_argument("--rope-scaling", default=None,
                   choices=["none", "linear", "yarn"])
    g.add_argument("--rope-freq-base", type=float, default=0.0)
    g.add_argument("--rope-freq-scale", type=float, default=0.0)
    g.add_argument("--yarn-orig-ctx", type=int, default=0)
    g.add_argument("--no-warmup", dest="warmup", action="store_false",
                   default=True)
    g.add_argument("--weights-dtype", default="bf16",
                   choices=["bf16", "f32", "quantized"],
                   help="HBM-resident weight format")

    g = p.add_argument_group("completion")
    g.add_argument("--temp", type=float, default=0.8)
    g.add_argument("--top-k", type=int, default=40)
    g.add_argument("--top-p", type=float, default=0.95)
    g.add_argument("--min-p", type=float, default=0.05)
    g.add_argument("--typical", dest="typ_p", type=float, default=1.0)
    g.add_argument("--repeat-penalty", type=float, default=1.0)
    g.add_argument("--repeat-last-n", type=int, default=64)
    g.add_argument("--frequency-penalty", type=float, default=0.0)
    g.add_argument("--presence-penalty", type=float, default=0.0)
    g.add_argument("-s", "--seed", type=int, default=-1)
    g.add_argument("-n", "--predict", dest="n_predict", type=int, default=-1)
    g.add_argument("--keep", dest="n_keep", type=int, default=0)
    g.add_argument("--jinja", action="store_true", default=True)
    g.add_argument("--no-jinja", dest="jinja", action="store_false")
    g.add_argument("--chat-template", default=None)
    g.add_argument("--chat-template-file", default=None)
    g.add_argument("--chat-template-kwargs", default=None,
                   help="JSON object merged into the template context")

    g = p.add_argument_group("speculative")
    g.add_argument("-md", "--model-draft", default=None)
    g.add_argument("--draft-max", "--draft", dest="draft_max", type=int,
                   default=8)
    g.add_argument("--draft-min", dest="draft_min", type=int, default=1)
    g.add_argument("--draft-p-min", dest="draft_p_min", type=float,
                   default=0.75)
    g.add_argument("--lookup-ngram-min", type=int, default=0)

    g = p.add_argument_group("embedding")
    g.add_argument("--embeddings", action="store_true", default=False)
    g.add_argument("--rerank", "--reranking", dest="rerank",
                   action="store_true", default=False)
    g.add_argument("--pooling", default=None,
                   choices=["none", "mean", "cls", "last", "rank"])

    g = p.add_argument_group("lora")
    g.add_argument("--lora", action="append", default=[],
                   help="LoRA adapter GGUF (repeatable)")
    g.add_argument("--lora-scaled", action="append", nargs=2, default=[],
                   metavar=("PATH", "SCALE"))
    g.add_argument("--lora-init-without-apply", action="store_true",
                   default=False)
    g.add_argument("--lora-per-request", action="store_true", default=False,
                   help="keep adapters unmerged; requests pick scales via "
                        "the 'lora' field (slots batch together regardless)")

    g = p.add_argument_group("multimodal")
    g.add_argument("--mmproj", default=None)

    g = p.add_argument_group("images")
    g.add_argument("--clip-vocab", default=None,
                   help="CLIP vocab.json for SD conditioning")
    g.add_argument("--clip-merges", default=None,
                   help="CLIP merges.txt for SD conditioning")
    g.add_argument("--image-upscale-model", default=None,
                   help="ESRGAN/RealESRGAN x4 GGUF applied to finished "
                        "images (reference engine_param.hpp:472)")
    g.add_argument("--image-upscale-repeats", type=int, default=1,
                   help="how many x4 upscaler rounds (default 1)")
    g.add_argument("--image-prediction", default="eps",
                   choices=["eps", "v"],
                   help="UNet output parametrization (v for SD2.x-768)")

    g = p.add_argument_group("compat (accepted for llama-box command-line "
                             "compatibility; mapped or ignored on TPU)")
    g.add_argument("-ngl", "--gpu-layers", "--n-gpu-layers", dest="ngl",
                   type=int, default=None, help="ignored: TPU runs all "
                   "layers on device")
    g.add_argument("--tensor-split", default=None,
                   help="ignored: use --mesh (SURVEY.md §2.3)")
    g.add_argument("--split-mode", default=None, choices=["none", "layer",
                                                          "row"],
                   help="ignored: use --mesh")
    g.add_argument("--main-gpu", type=int, default=None, help="ignored")
    g.add_argument("--device", default=None, help="ignored")
    g.add_argument("--rpc", default=None,
                   help="ignored: remote hosts join the mesh via "
                        "--coordinator (SURVEY.md §2.2)")
    g.add_argument("--flash-attn", action="store_true", default=None,
                   help="always on for prefill (Pallas kernel)")
    g.add_argument("--no-mmap", action="store_true", help="ignored")
    g.add_argument("--mlock", action="store_true", help="ignored")
    g.add_argument("--override-kv", action="append", default=[],
                   help="KEY=TYPE:VALUE metadata overrides")
    g.add_argument("--no-context-shift", dest="context_shift",
                   action="store_false", default=True,
                   help="accepted; context shift stays enabled")
    g.add_argument("--swa-full", action="store_true", help="ignored")
    g.add_argument("--kv-unified", action="store_true",
                   help="accepted: the KV cache is already one buffer")

    g = p.add_argument_group("tpu/distributed")
    g.add_argument("--mesh", default=None,
                   help="device mesh spec, e.g. 'tp=4' or 'dp=2,tp=4'")
    g.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address for multi-host")
    g.add_argument("--num-hosts", type=int, default=1)
    g.add_argument("--host-id", type=int, default=0)
    g.add_argument("--control-bind", default="tcp://*:18182",
                   help="host-0 control-plane PUB bind")
    g.add_argument("--control-connect", default=None,
                   help="worker: host-0 control-plane address "
                        "(tcp://host0:18182)")
    return p


def _serve_images(args) -> int:
    """Image-generation-only server for a Stable Diffusion GGUF (the
    reference's sd-model dispatch at load, SURVEY.md §2.1 #21)."""
    from .diffusion.sd_models import build_sd_pipeline
    from .models.config import ModelConfig
    from .server.engine import Engine, EngineConfig
    from .server.http import HTTPServer, run_app
    from .tokenizer.clip_bpe import CLIPTokenizer, HashTokenizer

    if args.clip_vocab:
        tok = CLIPTokenizer.from_files(args.clip_vocab, args.clip_merges)
    else:
        SRV_WRN("main", "no --clip-vocab given; SD conditioning uses a "
                "degraded hash tokenizer")
        tok = HashTokenizer()
    SRV_INF("main", "loading SD model %s", args.model)
    pipeline = build_sd_pipeline(args.model, tokenizer=tok,
                                 prediction=args.image_prediction)
    upscaler = None
    if args.image_upscale_model:
        from .diffusion.esrgan import Upscaler
        upscaler = Upscaler(args.image_upscale_model)
    engine = Engine(ModelConfig(), None, None,
                    EngineConfig(n_slots=1, n_ctx=16),
                    images_pipeline=pipeline, upscaler=upscaler,
                    upscale_repeats=args.image_upscale_repeats)
    engine.start()
    server = HTTPServer(engine,
                        model_name=args.alias or args.model.rsplit("/", 1)[-1],
                        capabilities={"completion": False, "embedding": False,
                                      "image": True})
    import asyncio
    import signal

    async def serve():
        runner = await run_app(server, args.host, args.port)
        stop = asyncio.Event()
        loop = asyncio.get_event_loop()
        for sig in (signal.SIGINT, signal.SIGTERM):
            loop.add_signal_handler(sig, stop.set)
        await stop.wait()
        await runner.cleanup()
        engine.stop()

    asyncio.run(serve())
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    set_verbosity(args.verbose + args.log_verbosity)

    if args.version:
        print(f"llama-box-tpu {VERSION}")
        return 0
    if args.system_info or args.list_devices:
        import jax
        print(f"llama-box-tpu {VERSION}")
        print(f"jax {jax.__version__}; backend={jax.default_backend()}")
        for d in jax.devices():
            print(f"  {d.id}: {d.device_kind} ({d.platform})")
        return 0
    if not args.model:
        print("error: -m/--model is required", file=sys.stderr)
        return 1
    for flag, val in (("-ngl", args.ngl), ("--tensor-split",
                                           args.tensor_split),
                      ("--split-mode", args.split_mode),
                      ("--main-gpu", args.main_gpu),
                      ("--device", args.device), ("--rpc", args.rpc)):
        if val is not None:
            SRV_WRN("main", "%s has no effect on TPU (use --mesh / "
                    "--coordinator)", flag)

    import jax.numpy as jnp

    from .gguf import GGUFFile
    from .models import load_model
    from .sampling import SamplerParams
    from .server.chat import ChatTemplates
    from .server.engine import Engine, EngineConfig
    from .server.http import HTTPServer, run_app
    from .tokenizer import Tokenizer

    if args.coordinator:
        import jax
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_hosts,
                                   process_id=args.host_id)

    mesh = None
    shard_fn = None
    if args.mesh:
        from .parallel import make_mesh, make_shard_fn, parse_mesh_spec
        mc = parse_mesh_spec(args.mesh)
        mesh = make_mesh(mc)
        if mc.dp > 1:
            SRV_WRN("main", "dp>1 serving shards slots over dp; prefill "
                    "crosses shards — prefer tp-only meshes for now")
        shard_fn = make_shard_fn(mesh)
        SRV_INF("main", "mesh: dp=%d tp=%d over %d devices", mc.dp, mc.tp,
                mc.dp * mc.tp)

    SRV_INF("main", "loading %s", args.model)
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32,
             "quantized": jnp.bfloat16}[args.weights_dtype]
    quantized = args.weights_dtype == "quantized"
    with GGUFFile(args.model) as g:
        arch = g.architecture
        is_sd = any(n.startswith("model.diffusion_model.") for n in g.tensors)
        tokenizer = None if is_sd else Tokenizer.from_gguf(g)

    if is_sd:
        return _serve_images(args)

    from .models.bert import BERT_ARCHS, load_bert
    is_bert = arch in BERT_ARCHS
    if is_bert:
        cfg, params = load_bert(args.model, dtype=dtype)
        if args.rerank or cfg.pooling == "rank":
            import dataclasses as _dc
            cfg = _dc.replace(cfg, pooling="rank")
    else:
        from .models.loader import parse_kv_overrides
        cfg, params = load_model(
            args.model, dtype=dtype, quantized=quantized, shard_fn=shard_fn,
            metadata_overrides=parse_kv_overrides(args.override_kv))
        if args.pooling:  # --pooling overrides the embedding pool mode
            import dataclasses as _dc
            cfg = _dc.replace(cfg, pooling=args.pooling)

    adapters = []
    lora_dynamic = 0
    if args.lora or args.lora_scaled:
        from .models.lora import apply_lora, load_lora, stack_dynamic
        for path in args.lora:
            adapters.append(load_lora(path, 1.0))
        for path, scale in args.lora_scaled:
            adapters.append(load_lora(path, float(scale)))
        if args.lora_per_request:
            lora_dynamic = stack_dynamic(params, cfg, adapters)
        elif not args.lora_init_without_apply:
            params = apply_lora(params, cfg, adapters)

    draft = None
    if args.model_draft:
        SRV_INF("main", "loading draft model %s", args.model_draft)
        draft = load_model(args.model_draft, dtype=dtype,
                           quantized=quantized)

    template_override = args.chat_template
    if args.chat_template_file:
        with open(args.chat_template_file) as f:
            template_override = f.read()

    ecfg = EngineConfig(
        n_slots=max(1, args.n_parallel),
        n_ctx=args.n_ctx,
        n_ubatch=args.n_ubatch,
        kv_dtype={"f32": "float32", "f16": "float16", "bf16": "bfloat16",
                  "q8_0": "int8", "int8": "int8"}[args.cache_type_k],
        n_keep_default=args.n_keep,
        prompt_cache=args.prompt_cache,
        draft_max=args.draft_max,
        draft_min=args.draft_min,
        draft_p_min=args.draft_p_min,
        lookup_ngram_min=args.lookup_ngram_min,
    )
    engine = Engine(cfg, params, tokenizer, ecfg, draft=draft, mesh=mesh)
    if lora_dynamic:
        engine.configure_lora(
            lora_dynamic,
            [0.0 if args.lora_init_without_apply else a.scale
             for a in adapters])

    if args.host_id > 0 or args.control_connect:
        # worker host: execute the host-0 step-plan stream (SURVEY.md §2.2
        # TPU-native RPC replacement); no HTTP, no scheduler thread
        from .parallel.controller import WorkerLoop, engine_ops
        addr = args.control_connect or "tcp://localhost:18182"
        WorkerLoop(addr, engine_ops(engine)).run_forever()
        return 0

    if args.num_hosts > 1:
        from .parallel.controller import ControlPlane
        engine.control = ControlPlane(args.control_bind,
                                      n_workers=args.num_hosts - 1)
    engine.start()

    defaults = SamplerParams(
        temp=args.temp, top_k=args.top_k, top_p=args.top_p, min_p=args.min_p,
        typ_p=args.typ_p, penalty_repeat=args.repeat_penalty,
        penalty_last_n=args.repeat_last_n, penalty_freq=args.frequency_penalty,
        penalty_present=args.presence_penalty)

    multimodal = None
    if args.mmproj:
        from .models.clip import load_clip
        from .server.multimodal import MultimodalProcessor
        ccfg, cparams = load_clip(args.mmproj)
        if ccfg.proj_dim != cfg.n_embd:
            print(f"error: mmproj projection dim {ccfg.proj_dim} != model "
                  f"embedding dim {cfg.n_embd}", file=sys.stderr)
            return 1
        acfg = aparams = None
        with GGUFFile(args.mmproj) as g:
            if g.metadata.get("clip.has_audio_encoder"):
                from .models.audio import load_audio_tower
                acfg, aparams = load_audio_tower(args.mmproj)
        multimodal = MultimodalProcessor(ccfg, cparams, audio_cfg=acfg,
                                         audio_params=aparams)

    max_tps = args.tokens_per_second
    if max_tps < 0:  # -1: auto-probe decode rate (reference -tps -1)
        SRV_INF("main", "probing decode tokens/sec ...")
        max_tps = engine.probe_decode_tps()
        SRV_INF("main", "decode rate: %.1f tok/s", max_tps)

    server = HTTPServer(
        engine,
        model_name=args.alias or (args.model.rsplit("/", 1)[-1]),
        defaults=defaults,
        chat_templates=ChatTemplates(tokenizer, template_override, args.jinja),
        capabilities={"reranking": args.rerank or
                      (is_bert and cfg.pooling == "rank"),
                      "completion": not is_bert and not args.embeddings,
                      "speculative": draft is not None
                      or args.lookup_ngram_min > 0},
        max_tps=max_tps,
        multimodal=multimodal,
        default_max_tokens=args.n_predict,
        chat_template_kwargs=(__import__("json").loads(
            args.chat_template_kwargs) if args.chat_template_kwargs else None),
        lora_adapters=[{"id": i, "path": a.path,
                        "scale": 0.0 if args.lora_init_without_apply
                        else a.scale}
                       for i, a in enumerate(adapters)],
    )

    async def serve():
        runner = await run_app(server, args.host, args.port)
        stop = asyncio.Event()
        loop = asyncio.get_event_loop()
        for sig in (signal.SIGINT, signal.SIGTERM):
            loop.add_signal_handler(sig, stop.set)
        await stop.wait()
        SRV_INF("main", "shutting down")
        await runner.cleanup()
        engine.stop()

    asyncio.run(serve())
    return 0


if __name__ == "__main__":
    sys.exit(main())
