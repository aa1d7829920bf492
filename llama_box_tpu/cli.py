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
    g.add_argument("--prompt-cache-share-min", type=int, default=32,
                   help="cross-slot prefix sharing: copy KV rows from any "
                        "slot sharing this many more prefix tokens than "
                        "the chosen slot's own cache (-1 disables)")
    g.add_argument("-tps", "--tokens-per-second", type=float, default=0.0,
                   help="max decode rate per request; -1 probes at startup")
    g.add_argument("-a", "--alias", "--model-alias", dest="alias",
                   default=None)

    g = p.add_argument_group("model")
    g.add_argument("-m", "--model", required=False,
                   help="path to the GGUF model")
    g.add_argument("-c", "--ctx-size", dest="n_ctx", type=int, default=8192)
    g.add_argument("-ub", "--ubatch-size", dest="n_ubatch", type=int,
                   default=512)
    g.add_argument("-b", "--batch-size", dest="n_batch", type=int,
                   default=2048)
    g.add_argument("--decode-chain", dest="decode_chain", type=int,
                   default=32,
                   help="tokens sampled per device dispatch on the plain "
                        "decode path (amortizes dispatch + host-sync "
                        "cost; tokens still stream, in bursts; 1 = "
                        "per-token dispatch like the reference)")
    g.add_argument("--no-decode-pipeline", dest="pipeline_chain",
                   action="store_false", default=True,
                   help="disable speculative dispatch of the next decode "
                        "chain (chain N+1 launches while chain N's tokens "
                        "are still syncing to the host)")
    g.add_argument("-ctk", "--cache-type-k", default="bf16",
                   choices=["f32", "f16", "bf16", "q8_0", "int8"])
    g.add_argument("-ctv", "--cache-type-v", default="bf16",
                   choices=["f32", "f16", "bf16", "q8_0", "int8"])
    g.add_argument("--rope-scaling", default=None,
                   choices=["none", "linear", "yarn"])
    g.add_argument("--rope-freq-base", type=float, default=0.0)
    g.add_argument("--rope-freq-scale", type=float, default=0.0)
    g.add_argument("--yarn-orig-ctx", type=int, default=0)
    g.add_argument("--rope-scale", type=float, default=0.0,
                   help="RoPE context scale factor N (freq scale = 1/N)")
    g.add_argument("--yarn-ext-factor", type=float, default=None)
    g.add_argument("--yarn-attn-factor", type=float, default=None)
    g.add_argument("--yarn-beta-fast", type=float, default=None)
    g.add_argument("--yarn-beta-slow", type=float, default=None)
    g.add_argument("--attention", default=None,
                   choices=["causal", "non-causal"],
                   help="override the attention type probe")
    g.add_argument("--cache-reuse", type=int, default=0,
                   help="accepted: prefix prompt-cache reuse is always on")
    g.add_argument("-dt", "--defrag-thold", type=float, default=None,
                   help="accepted: slot KV is defragmented by shifting")
    g.add_argument("--no-cache-prompt", dest="prompt_cache",
                   action="store_false",
                   help="alias of --no-prompt-cache")
    g.add_argument("--context-shift", action="store_true", default=True,
                   help="context shift is enabled by default")
    g.add_argument("-nr", "--no-repack", action="store_true",
                   help="accepted: repack layout is TPU-chosen")
    g.add_argument("--mmap", action="store_true",
                   help="accepted: GGUF tensors are always mmapped")
    g.add_argument("--warmup", action="store_true", default=True,
                   help="warmup compile at startup (default)")
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
    g.add_argument("--mirostat", type=int, default=0, choices=[0, 1, 2])
    g.add_argument("--mirostat-ent", dest="mirostat_tau", type=float,
                   default=5.0, help="mirostat target entropy tau")
    g.add_argument("--mirostat-lr", dest="mirostat_eta", type=float,
                   default=0.1, help="mirostat learning rate eta")
    g.add_argument("--dry-multiplier", type=float, default=0.0)
    g.add_argument("--dry-base", type=float, default=1.75)
    g.add_argument("--dry-allowed-length", type=int, default=2)
    g.add_argument("--dry-penalty-last-n", type=int, default=-1)
    g.add_argument("--dry-sequence-breaker", action="append", default=None,
                   help="DRY sequence breaker (repeatable; 'none' clears; "
                        "default: newline ':' '\"' '*')")
    g.add_argument("--dynatemp-range", type=float, default=0.0)
    g.add_argument("--dynatemp-exp", dest="dynatemp_exponent", type=float,
                   default=1.0)
    g.add_argument("--xtc-probability", type=float, default=0.0)
    g.add_argument("--xtc-threshold", type=float, default=0.10)
    g.add_argument("--top-nsigma", type=float, default=-1.0)
    g.add_argument("-l", "--logit-bias", action="append", default=[],
                   metavar="TOKEN_ID(+/-)BIAS",
                   help="server default logit bias, e.g. 29871+1.5 "
                        "or 29871-inf (repeatable)")
    g.add_argument("--grammar", default="",
                   help="server default GBNF grammar")
    g.add_argument("--grammar-file", default=None)
    g.add_argument("-j", "--json-schema", default=None,
                   help="server default JSON schema (converted to GBNF)")
    g.add_argument("--samplers", "--sampling-seq", dest="samplers",
                   default=None,
                   help="sampler selection + order, ';'-separated; a "
                        "non-canonical order is honored via host-side "
                        "sampling (the fused TPU chain covers the default)")
    g.add_argument("-r", "--reverse-prompt", action="append", default=[],
                   help="stop strings added to every request")
    g.add_argument("-sp", "--special", action="store_true", default=False,
                   help="render special tokens in output text")
    g.add_argument("-e", "--escape", action="store_true", default=True,
                   help="process escape sequences (accepted; server "
                        "prompts arrive via JSON which already unescapes)")
    g.add_argument("--no-escape", dest="escape", action="store_false")
    g.add_argument("-s", "--seed", type=int, default=-1)
    g.add_argument("-n", "--predict", dest="n_predict", type=int, default=-1)
    g.add_argument("--keep", dest="n_keep", type=int, default=0)
    g.add_argument("--jinja", action="store_true", default=True)
    g.add_argument("--no-jinja", dest="jinja", action="store_false")
    g.add_argument("--chat-template", default=None)
    g.add_argument("--chat-template-file", default=None)
    g.add_argument("--chat-template-kwargs", default=None,
                   help="JSON object merged into the template context")
    g.add_argument("--enable-reasoning", dest="enable_reasoning",
                   action="store_true", default=True)
    g.add_argument("--no-enable-reasoning", dest="enable_reasoning",
                   action="store_false",
                   help="disable reasoning-block splitting")
    g.add_argument("--reasoning-in-content", dest="reasoning_in_content",
                   action="store_true", default=False,
                   help="keep reasoning text inline in content")
    g.add_argument("--no-reasoning-in-content", dest="reasoning_in_content",
                   action="store_false")

    g = p.add_argument_group("speculative")
    g.add_argument("-md", "--model-draft", default=None)
    g.add_argument("--draft-max", "--draft", dest="draft_max", type=int,
                   default=8)
    g.add_argument("--draft-min", dest="draft_min", type=int, default=1)
    g.add_argument("--draft-p-min", dest="draft_p_min", type=float,
                   default=0.75)
    g.add_argument("--lookup-ngram-min", type=int, default=0)
    # TPU extension: draft+verify rounds chained per device dispatch
    g.add_argument("--spec-rounds", dest="spec_rounds", type=int,
                   default=4)
    # TPU extension: moving-acceptance gate for n-gram drafting (0 = off)
    g.add_argument("--lookup-min-accept", dest="lookup_min_accept",
                   type=float, default=0.66)
    g.add_argument("--lookup-probe-every", dest="lookup_probe_every",
                   type=int, default=64)

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

    g = p.add_argument_group("control vectors")
    g.add_argument("--control-vector", action="append", default=[],
                   help="control vector GGUF added to the residual stream "
                        "(repeatable)")
    g.add_argument("--control-vector-scaled", action="append", nargs=2,
                   default=[], metavar=("PATH", "SCALE"))
    g.add_argument("--control-vector-layer-range", nargs=2, type=int,
                   default=None, metavar=("START", "END"),
                   help="1-based inclusive layer range to steer")

    g = p.add_argument_group("multimodal")
    g.add_argument("--mmproj", default=None)
    g.add_argument("--visual-max-image-size", type=int, default=0,
                   help="downscale images so the long side <= N px")
    g.add_argument("--visual-max-image-cache", "--max-projected-cache",
                   dest="visual_max_image_cache", type=int, default=0,
                   help="accepted: projected-embedding LRU entries")

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
    g.add_argument("--image-sample-method", "--image-sampler",
                   dest="image_sampler", default="euler_a",
                   help="euler, euler_a, heun, dpm++2m (sd.cpp names "
                        "accepted; unknown map to the closest)")
    g.add_argument("--image-sampling-steps", "--image-sample-steps",
                   dest="image_steps", type=int, default=10)
    g.add_argument("--image-schedule-method", "--image-schedule",
                   dest="image_schedule", default="discrete",
                   choices=["default", "discrete", "karras", "exponential",
                            "ays", "gits"],
                   help="sigma schedule (ays/gits map to discrete)")
    g.add_argument("--image-cfg-scale", type=float, default=None,
                   help="default classifier-free-guidance scale")
    g.add_argument("--image-guidance", type=float, default=3.5,
                   help="accepted: distilled-guidance models")
    g.add_argument("--image-strength", type=float, default=0.75,
                   help="default img2img noising strength")
    g.add_argument("--image-max-batch", type=int, default=4,
                   help="max images per request")
    g.add_argument("--image-max-height", type=int, default=1024)
    g.add_argument("--image-max-width", type=int, default=1024)
    g.add_argument("--image-vae-model", default=None,
                   help="separate VAE GGUF overriding the checkpoint VAE")
    g.add_argument("--image-clip-l-model", default=None,
                   help="separate CLIP-L text encoder GGUF")
    g.add_argument("--image-clip-g-model", default=None,
                   help="separate CLIP-G text encoder GGUF (SDXL)")
    g.add_argument("--image-t5xxl-model", default=None,
                   help="T5-XXL text encoder GGUF (SD3/FLUX; accepted)")
    g.add_argument("--image-taesd-model", default=None,
                   help="TAESD GGUF for per-step latent previews")
    g.add_argument("--image-vae-tiling", action="store_true", default=False,
                   help="decode the VAE in tiles (large images)")
    g.add_argument("--image-no-vae-tiling", dest="image_vae_tiling",
                   action="store_false")
    g.add_argument("--image-slg-scale", type=float, default=0.0,
                   help="accepted: skip-layer guidance (SD3.5)")
    g.add_argument("--image-skip-layer", action="append", default=None,
                   help="accepted with --image-slg-scale")
    g.add_argument("--image-slg-start", type=float, default=0.01)
    g.add_argument("--image-slg-end", type=float, default=0.2)
    g.add_argument("--image-control-net-model", default=None,
                   help="SD1.x/SDXL ControlNet GGUF (control_model.* "
                        "tensors); requests supply the control image via "
                        "the image-edit 'control' part or 'control_image'")
    g.add_argument("--image-control-strength", type=float, default=0.9)
    g.add_argument("--image-control-canny", action="store_true")
    g.add_argument("--image-no-control-net-model-offload",
                   action="store_true", help="ignored: TPU HBM residency")
    g.add_argument("--image-no-text-encoder-model-offload",
                   action="store_true", help="ignored: TPU HBM residency")
    g.add_argument("--image-no-vae-model-offload", action="store_true",
                   help="ignored: TPU HBM residency")
    g.add_argument("--image-free-compute-memory-immediately",
                   action="store_true", help="ignored")

    g = p.add_argument_group("compat (accepted for llama-box command-line "
                             "compatibility; mapped or ignored on TPU)")
    g.add_argument("-ngl", "--gpu-layers", "--n-gpu-layers", dest="ngl",
                   type=int, default=None, help="ignored: TPU runs all "
                   "layers on device")
    g.add_argument("-ts", "--tensor-split", default=None,
                   help="ignored: use --mesh (SURVEY.md §2.3)")
    g.add_argument("-sm", "--split-mode", default=None,
                   choices=["none", "layer",
                                                          "row"],
                   help="ignored: use --mesh")
    g.add_argument("-mg", "--main-gpu", type=int, default=None,
                   help="ignored")
    g.add_argument("-dev", "--device", default=None, help="ignored")
    g.add_argument("--rpc", default=None,
                   help="ignored: remote hosts join the mesh via "
                        "--coordinator (SURVEY.md §2.2)")
    g.add_argument("-fa", "--flash-attn", action="store_true", default=None,
                   help="always on for prefill (Pallas kernel)")
    g.add_argument("--no-mmap", action="store_true", help="ignored")
    g.add_argument("--mlock", action="store_true", help="ignored")
    g.add_argument("--override-kv", action="append", default=[],
                   help="KEY=TYPE:VALUE metadata overrides")
    g.add_argument("--no-context-shift", dest="context_shift",
                   action="store_false", default=True,
                   help="accepted; context shift stays enabled")
    g.add_argument("--swa-full", action="store_true", help="ignored")
    g.add_argument("-kvu", "--kv-unified", action="store_true",
                   help="accepted: the KV cache is already one buffer")
    g.add_argument("-t", "--threads", type=int, default=None,
                   help="host CPU threads (sets OMP_NUM_THREADS for the "
                        "native cores)")
    g.add_argument("-tb", "--threads-batch", type=int, default=None,
                   help="accepted; TPU batching is compiled")
    g.add_argument("--cpu-mask", default=None, help="ignored")
    g.add_argument("--cpu-mask-batch", default=None, help="ignored")
    g.add_argument("--cpu-range", default=None, help="ignored")
    g.add_argument("--cpu-range-batch", default=None, help="ignored")
    g.add_argument("--cpu-strict", type=int, default=None, help="ignored")
    g.add_argument("--cpu-strict-batch", type=int, default=None,
                   help="ignored")
    g.add_argument("--poll", type=int, default=None, help="ignored")
    g.add_argument("--poll-batch", type=int, default=None, help="ignored")
    g.add_argument("--prio", type=int, default=None, help="ignored")
    g.add_argument("--prio-batch", type=int, default=None, help="ignored")
    g.add_argument("--numa", default=None, help="ignored")
    g.add_argument("-nkvo", "--no-kv-offload", action="store_true",
                   help="ignored: KV lives in HBM")
    g.add_argument("--no-flash-attn", action="store_true",
                   help="disables the Pallas flash-attention prefill path")
    g.add_argument("-ngld", "--gpu-layers-draft", "--n-gpu-layers-draft",
                   dest="ngld", type=int, default=None, help="ignored")
    g.add_argument("-devd", "--device-draft", default=None, help="ignored")
    g.add_argument("-ot", "--override-tensor", action="append",
                   default=None, help="ignored: XLA owns placement")
    g.add_argument("-otd", "--override-tensor-draft", action="append",
                   default=None, help="ignored")
    g.add_argument("-cmoe", "--cpu-moe", action="store_true",
                   help="ignored: experts stay in HBM")
    g.add_argument("-ncmoe", "--n-cpu-moe", type=int, default=None,
                   help="ignored")
    g.add_argument("-cmoed", "--cpu-moe-draft", action="store_true",
                   help="ignored")
    g.add_argument("-ncmoed", "--n-cpu-moe-draft", type=int, default=None,
                   help="ignored")
    g.add_argument("--draft-n", dest="draft_max", type=int, default=8,
                   help="alias of --draft-max")
    g.add_argument("--draft-n-min", dest="draft_min", type=int, default=1,
                   help="alias of --draft-min")
    g.add_argument("--conn-idle", type=int, default=60,
                   help="idle connection reaping seconds")
    g.add_argument("--conn-keepalive", type=int, default=15,
                   help="keep-alive seconds after a response")
    g.add_argument("--slot-save-path", default=None,
                   help="accepted: slot KV save/restore lands in r2")
    g.add_argument("--embedding", dest="embeddings", action="store_true",
                   help="alias of --embeddings")
    g.add_argument("--images", action="store_true", default=None,
                   help="accepted: image endpoints switch on when the "
                        "model is a diffusion checkpoint")
    g.add_argument("--log-colors", action="store_true", help="accepted")
    g.add_argument("--log-verbose", dest="log_verbose_flag",
                   action="store_true",
                   help="alias of high --log-verbosity")
    g.add_argument("--verbosity", dest="log_verbosity", type=int,
                   default=0, help="alias of -lv")
    g.add_argument("--usage", action="help",
                   help="print usage (alias of --help)")
    g.add_argument("--list-buffer-types", action="store_true",
                   help="list device memory kinds and exit")
    g.add_argument("--rpc-server-host", default=None,
                   help="unsupported: run a worker with --control-connect "
                        "(SURVEY.md §2.3)")
    g.add_argument("--rpc-server-port", type=int, default=None,
                   help="unsupported: see --rpc-server-host")
    g.add_argument("--rpc-server-main-gpu", type=int, default=None,
                   help="ignored")
    g.add_argument("--rpc-server-threads", type=int, default=None,
                   help="ignored")
    g.add_argument("--rpc-server-cache", action="store_true",
                   help="ignored")
    g.add_argument("--rpc-server-cache-dir", default=None, help="ignored")
    g.add_argument("--rpc-server-reserve-memory", type=int, default=None,
                   help="ignored")

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
    from .gguf import GGUFFile
    with GGUFFile(args.model) as g:
        is_flux = any("double_blocks." in n or "single_blocks." in n
                      for n in g.tensors)
        is_sd3 = any("joint_blocks." in n for n in g.tensors)
    if is_flux:
        from .diffusion.flux import build_flux_pipeline
        pipeline = build_flux_pipeline(
            args.model, tokenizer=tok, t5_path=args.image_t5xxl_model,
            clip_l_path=args.image_clip_l_model,
            vae_path=args.image_vae_model, guidance=args.image_guidance)
    elif is_sd3:
        from .diffusion.sd3 import build_sd3_pipeline
        pipeline = build_sd3_pipeline(
            args.model, tokenizer=tok, t5_path=args.image_t5xxl_model,
            clip_l_path=args.image_clip_l_model,
            clip_g_path=args.image_clip_g_model,
            vae_path=args.image_vae_model)
    else:
        pipeline = build_sd_pipeline(
            args.model, tokenizer=tok, prediction=args.image_prediction,
            control_net_path=args.image_control_net_model,
            control_strength=args.image_control_strength)
    if args.image_taesd_model:
        from .diffusion.taesd import TaesdPreview
        pipeline.preview_fn = TaesdPreview(args.image_taesd_model)
    upscaler = None
    if args.image_upscale_model:
        from .diffusion.esrgan import Upscaler
        upscaler = Upscaler(args.image_upscale_model)
    engine = Engine(ModelConfig(), None, None,
                    EngineConfig(n_slots=1, n_ctx=16),
                    images_pipeline=pipeline, upscaler=upscaler,
                    upscale_repeats=args.image_upscale_repeats)
    engine.start()
    if args.image_control_net_model and (is_flux or is_sd3):
        SRV_WRN("main", "--image-control-net-model: only SD1.x/SDXL "
                "control nets are supported; ignoring")
    server = HTTPServer(engine,
                        model_name=args.alias or args.model.rsplit("/", 1)[-1],
                        capabilities={"completion": False, "embedding": False,
                                      "image": True},
                        image_defaults=_image_defaults(args))
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


_DEFAULT_SAMPLER_ORDER = (
    "penalties;dry;top_n_sigma;top_k;typ_p;top_p;min_p;xtc;temperature")


def _parse_logit_bias_flags(entries: list[str]) -> dict[int, float]:
    """TOKEN_ID(+/-)BIAS, e.g. 29871+1.5, 29871-0.5, 29871-inf
    (engine_param.hpp --logit-bias)."""
    out: dict[int, float] = {}
    for e in entries:
        import re as _re
        m = _re.match(r"^(\d+)([+-])(inf|[0-9.]+)$", e.strip())
        if not m:
            SRV_WRN("main", "--logit-bias %r is malformed (want "
                    "TOKEN_ID+BIAS or TOKEN_ID-inf); ignored", e)
            continue
        tid, sign, val = int(m.group(1)), m.group(2), m.group(3)
        bias = float("-inf") if val == "inf" else float(val)
        out[tid] = -bias if sign == "-" and val != "inf" else bias
    return out


def _default_sampling(args) -> SamplerParams:
    """Server-wide sampling defaults from the CLI (merged under each
    request's own fields, reference common_params_sampling)."""
    brks = args.dry_sequence_breaker
    if brks is None:
        brks = ("\n", ":", "\"", "*")
    elif brks == ["none"]:
        brks = ()
    samplers = ()
    if args.samplers:
        from .sampling import sampler_types_from_names
        samplers = sampler_types_from_names(
            args.samplers.replace(",", ";").split(";"))
    return SamplerParams(
        samplers=samplers,
        temp=args.temp, top_k=args.top_k, top_p=args.top_p,
        min_p=args.min_p, typ_p=args.typ_p,
        penalty_repeat=args.repeat_penalty,
        penalty_last_n=args.repeat_last_n,
        penalty_freq=args.frequency_penalty,
        penalty_present=args.presence_penalty,
        xtc_probability=args.xtc_probability,
        xtc_threshold=args.xtc_threshold,
        top_n_sigma=args.top_nsigma,
        dynatemp_range=args.dynatemp_range,
        dynatemp_exponent=args.dynatemp_exponent,
        mirostat=args.mirostat, mirostat_tau=args.mirostat_tau,
        mirostat_eta=args.mirostat_eta,
        dry_multiplier=args.dry_multiplier, dry_base=args.dry_base,
        dry_allowed_length=args.dry_allowed_length,
        dry_penalty_last_n=args.dry_penalty_last_n,
        dry_sequence_breakers=tuple(brks),
        logit_bias=_parse_logit_bias_flags(args.logit_bias),
    )


def _default_grammar_text(args) -> str | None:
    if args.grammar:
        return args.grammar
    if args.grammar_file:
        with open(args.grammar_file) as f:
            return f.read()
    if args.json_schema:
        import json as _json

        from .grammar import json_schema_to_grammar
        return json_schema_to_grammar(_json.loads(args.json_schema))
    return None


def _image_defaults(args) -> dict:
    return {
        "sampler": args.image_sampler,
        "steps": args.image_steps,
        "schedule": ("" if args.image_schedule in ("default", "ays", "gits")
                     else args.image_schedule),
        "cfg_scale": (args.image_cfg_scale if args.image_cfg_scale
                      is not None else 7.0),
        "strength": args.image_strength,
        "max_batch": args.image_max_batch,
        "max_width": args.image_max_width,
        "max_height": args.image_max_height,
        "control_canny": args.image_control_canny,
    }


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.log_verbose_flag:
        args.log_verbosity = max(args.log_verbosity, 3)
    set_verbosity(args.verbose + args.log_verbosity)
    if args.threads:
        import os as _os
        _os.environ.setdefault("OMP_NUM_THREADS", str(args.threads))
    if args.no_flash_attn:
        import os as _os
        _os.environ["LLAMA_BOX_TPU_NO_FLASH"] = "1"
    if args.samplers:
        from .sampling import (sampler_types_from_names,
                               samplers_order_canonical)
        _order = sampler_types_from_names(
            args.samplers.replace(",", ";").split(";"))
        if not samplers_order_canonical(_order):
            SRV_WRN("main", "--samplers: order differs from the fused TPU "
                    "chain (%s); every request will sample host-side to "
                    "honor it", _DEFAULT_SAMPLER_ORDER)
    if args.rpc_server_host:
        SRV_WRN("main", "--rpc-server-*: the TPU replacement is mesh "
                "worker mode (--control-connect, SURVEY.md §2.3)")
    if args.list_buffer_types:
        import jax
        print(f"llama-box-tpu {VERSION}")
        for dd in jax.devices():
            stats = {}
            try:
                stats = dd.memory_stats() or {}
            except Exception:  # noqa: BLE001
                pass
            lim = stats.get("bytes_limit")
            print(f"  {dd.id}: {dd.device_kind} ({dd.platform})"
                  + (f" hbm={lim / 1e9:.1f}GB" if lim else ""))
        return 0

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
    is_t5 = arch in ("t5", "t5encoder")
    if is_bert:
        cfg, params = load_bert(args.model, dtype=dtype)
        if args.rerank or cfg.pooling == "rank":
            import dataclasses as _dc
            cfg = _dc.replace(cfg, pooling="rank")
    elif is_t5:
        from .models.t5_serve import load_t5_serve
        cfg, params = load_t5_serve(args.model, dtype=dtype)
    else:
        from .models.loader import parse_kv_overrides
        cfg, params = load_model(
            args.model, dtype=dtype, quantized=quantized, shard_fn=shard_fn,
            metadata_overrides=parse_kv_overrides(args.override_kv))
        if args.pooling:  # --pooling overrides the embedding pool mode
            import dataclasses as _dc
            cfg = _dc.replace(cfg, pooling=args.pooling)
        rope_over = {}
        if args.rope_scaling:
            rope_over["rope_scaling_type"] = args.rope_scaling
        if args.rope_freq_base > 0:
            rope_over["rope_freq_base"] = args.rope_freq_base
        if args.rope_freq_scale > 0:
            rope_over["rope_freq_scale"] = args.rope_freq_scale
        elif args.rope_scale > 0:
            rope_over["rope_freq_scale"] = 1.0 / args.rope_scale
        if args.yarn_orig_ctx > 0:
            rope_over["rope_orig_ctx"] = args.yarn_orig_ctx
        for fname in ("yarn_ext_factor", "yarn_attn_factor",
                      "yarn_beta_fast", "yarn_beta_slow"):
            v = getattr(args, fname)
            if v is not None:
                rope_over[fname] = v
        if args.attention:
            rope_over["causal"] = args.attention == "causal"
        if rope_over:
            import dataclasses as _dc
            cfg = _dc.replace(cfg, **rope_over)
            SRV_INF("main", "config overrides: %s", rope_over)
        if args.control_vector or args.control_vector_scaled:
            from .models.control_vector import combine_control_vectors
            entries = [(pth, 1.0) for pth in args.control_vector]
            entries += [(pth, float(sc))
                        for pth, sc in args.control_vector_scaled]
            lr = (tuple(args.control_vector_layer_range)
                  if args.control_vector_layer_range else None)
            cv = combine_control_vectors(entries, cfg.n_layers, cfg.n_embd,
                                         layer_range=lr)
            params["cvec"] = jnp.asarray(cv, dtype)

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
        cache_share_min=args.prompt_cache_share_min,
        draft_max=args.draft_max,
        draft_min=args.draft_min,
        draft_p_min=args.draft_p_min,
        decode_chain=max(1, args.decode_chain),
        pipeline_chain=args.pipeline_chain,
        lookup_ngram_min=args.lookup_ngram_min,
        lookup_min_accept=args.lookup_min_accept,
        lookup_probe_every=args.lookup_probe_every,
        spec_rounds=max(1, args.spec_rounds),
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
        engine.fuse_params()   # same fused program as host 0
        WorkerLoop(addr, engine_ops(engine),
                   worker_id=max(1, args.host_id)).run_forever()
        return 0

    if args.num_hosts > 1:
        from .parallel.controller import ControlPlane
        engine.control = ControlPlane(args.control_bind,
                                      n_workers=args.num_hosts - 1)
        # block until every worker has loaded its model replica and its
        # SUB pipe is provably receiving (zmq slow-joiner)
        engine.control.wait_ready(timeout=600.0)
    engine.start()

    defaults = _default_sampling(args)

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
        if args.visual_max_image_size > 0:
            multimodal.max_image_size = args.visual_max_image_size
        if args.visual_max_image_cache > 0:
            multimodal.max_cache = args.visual_max_image_cache

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
                      # recurrent/enc-dec models: no embeddings forward,
                      # no speculative decoding (engine gates both)
                      "embedding": not cfg.recurrent and not is_t5,
                      "speculative": (draft is not None
                                      or args.lookup_ngram_min > 0)
                      and not cfg.recurrent and not is_t5},
        max_tps=max_tps,
        multimodal=multimodal,
        default_max_tokens=args.n_predict,
        default_grammar=_default_grammar_text(args),
        default_stop=tuple(args.reverse_prompt),
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
