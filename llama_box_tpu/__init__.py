"""llama-box-tpu: a TPU-native, OpenAI-compatible quantized-inference server.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of gpustack/llama-box
(reference: /root/reference, see SURVEY.md): GGUF block-quant model loading,
fused dequant matmul kernels, paged INT8 KV-cache, continuous batching with
prefix caching and context shifting, speculative decoding, and an
OpenAI-compatible HTTP API — built TPU-first (SPMD meshes, pjit, Pallas).
"""

__version__ = "0.1.0"
