"""Externally-stepped diffusion pipeline (txt2img/img2img).

The serving loop drives one step at a time (`begin` -> N x `step` ->
`result`), mirroring the reference's streaming sampler wrapper
(z_stablediffusion.hpp txt2img_stream/img2img_stream/sd_sampling_stream_*):
steps interleave with LLM decode passes in the reconcile loop and each step
can yield a progress preview.

The model interface is three callables so diffusion weights plug in
independently of the scheduler machinery:
    text_encode(prompt: str, negative: str) -> cond (any pytree)
    denoiser(latents [H', W', C], sigma: float, cond) -> eps prediction
    vae_decode(latents) -> image f32 [H, W, 3] in [0, 1]
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from .scheduler import NoiseSchedule, SAMPLERS, make_sigmas, _Dpmpp2mState


@dataclasses.dataclass
class GenerationParams:
    prompt: str = ""
    negative_prompt: str = ""
    width: int = 512
    height: int = 512
    steps: int = 20
    cfg_scale: float = 7.0
    sampler: str = "euler"
    seed: int = 0
    strength: float = 0.75        # img2img denoise strength
    karras: bool = False
    schedule: str = ""            # ""/discrete/karras/exponential


class StreamState:
    """One image being generated (a 'stream'; reference runs req.n of these
    per request, seeds seed+i; httpserver.hpp:4161-4175)."""

    def __init__(self, pipeline: "DiffusionPipeline", p: GenerationParams,
                 init_image: Optional[np.ndarray] = None,
                 mask: Optional[np.ndarray] = None,
                 control: Optional[np.ndarray] = None):
        self.pl = pipeline
        self.p = p
        self.control = None
        if control is not None:
            embed = getattr(pipeline, "hint_embed", None)
            if embed is None:
                raise ValueError("this server has no ControlNet loaded "
                                 "(--image-control-net-model)")
            self.control = embed(control)
        self.rng = np.random.default_rng(p.seed & 0xFFFFFFFF)
        self.cond = pipeline.text_encode(p.prompt, p.negative_prompt)
        lat_h = p.height // pipeline.latent_scale
        lat_w = p.width // pipeline.latent_scale
        shape = (lat_h, lat_w, pipeline.latent_channels)

        if pipeline.sigma_fn is not None:
            sigmas = pipeline.sigma_fn(p.steps, (lat_h, lat_w))
        else:
            sigmas = make_sigmas(pipeline.schedule, p.steps, p.karras,
                                 method=p.schedule or None)
        if init_image is not None:
            # img2img: start from the encoded image + noise at strength
            start = min(int(p.steps * p.strength), p.steps - 1)
            start = p.steps - 1 - start
            lat = pipeline.vae_encode(init_image)
            noise = self.rng.standard_normal(shape).astype(np.float32)
            if pipeline.flow:
                # rectified flow: x_t = (1-t) x0 + t n
                lat = lat * (1.0 - sigmas[start]) + noise * sigmas[start]
            else:
                lat = lat + noise * sigmas[start]
            self.sigmas = sigmas[start:]
            self.mask_latent = (None if mask is None else
                                pipeline.downsample_mask(mask, lat_h, lat_w))
            self.init_latent = pipeline.vae_encode(init_image) \
                if mask is not None else None
        else:
            lat = (self.rng.standard_normal(shape).astype(np.float32)
                   * sigmas[0])
            self.sigmas = sigmas
            self.mask_latent = None
            self.init_latent = None
        self.latents = jnp.asarray(lat)
        self.i = 0
        from .scheduler import resolve_sampler
        self.sampler_name = resolve_sampler(p.sampler)
        if pipeline.flow and self.sampler_name not in ("euler", "heun"):
            # VE-specific steppers (ancestral noise, dpm log-space) don't
            # transfer to sigma==t flow; euler IS the rectified-flow ODE
            self.sampler_name = "euler"
        self.sampler_state = (_Dpmpp2mState()
                              if self.sampler_name == "dpm++2m" else None)

    @property
    def total_steps(self) -> int:
        return len(self.sigmas) - 1

    @property
    def done(self) -> bool:
        return self.i >= self.total_steps

    def step(self) -> None:
        """One denoising step (a reconcile pass advances each live stream by
        exactly one of these)."""
        if self.done:
            return
        fn = SAMPLERS[self.sampler_name]

        def denoise_cfg(x, sigma, cond):
            eps_c, eps_u = self.pl.denoise_both(x, sigma, cond,
                                                control=self.control)
            return eps_u + self.p.cfg_scale * (eps_c - eps_u)

        kwargs = {}
        if self.sampler_state is not None:
            kwargs["state"] = self.sampler_state
        self.latents = fn(denoise_cfg, self.latents, self.sigmas, self.i,
                          self.rng, self.cond, **kwargs)
        if self.mask_latent is not None and self.init_latent is not None \
                and self.i + 1 < self.total_steps:
            # inpainting: keep unmasked regions on the original trajectory
            sigma_next = self.sigmas[self.i + 1]
            noise = self.rng.standard_normal(self.latents.shape)
            orig = self.init_latent + noise.astype(np.float32) * sigma_next
            m = self.mask_latent[..., None]
            self.latents = self.latents * m + jnp.asarray(orig) * (1.0 - m)
        self.i += 1

    def preview(self) -> np.ndarray:
        """Latent->RGB preview: TAESD decode when a tiny autoencoder is
        loaded (--image-taesd-model), else a linear projection."""
        if getattr(self.pl, "preview_fn", None) is not None:
            return self.pl.preview_fn(np.asarray(self.latents))
        return self.pl.latent_preview(np.asarray(self.latents))

    def result(self) -> np.ndarray:
        """Final decoded image [H, W, 3] uint8."""
        img = np.asarray(self.pl.vae_decode(self.latents))
        return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


class DiffusionPipeline:
    """Holds the model callables + schedule; makes streams."""

    # SD-1.x latent preview projection (4ch -> RGB), public approximation
    _PREVIEW = np.array([[0.298, 0.207, 0.208],
                         [0.187, 0.286, 0.173],
                         [-0.158, 0.189, 0.264],
                         [-0.184, -0.271, -0.473]], np.float32)

    def __init__(self, text_encode: Callable, denoiser: Callable,
                 vae_decode: Callable, vae_encode: Callable | None = None,
                 latent_channels: int = 4, latent_scale: int = 8,
                 schedule: NoiseSchedule | None = None,
                 supports_negative: bool = True,
                 flow: bool = False, sigma_fn: Callable | None = None):
        """flow: rectified-flow model (FLUX/SD3) — sigma==t semantics,
        flow-style img2img mixing, euler stepping.
        sigma_fn(n_steps, (lat_h, lat_w)) -> sigma ladder override (flow
        models shift the schedule by resolution)."""
        self.text_encode = text_encode
        self._denoiser = denoiser
        self.vae_decode = vae_decode
        self.vae_encode = vae_encode or (lambda img: (_ for _ in ()).throw(
            ValueError("img2img is not supported by this model")))
        self.latent_channels = latent_channels
        self.latent_scale = latent_scale
        self.schedule = schedule or NoiseSchedule()
        self.supports_negative = supports_negative
        self.flow = flow
        self.sigma_fn = sigma_fn
        self.preview_fn = None   # TAESD preview decoder (cli wires it)

    def denoise_both(self, x, sigma, cond, control=None):
        """Returns (eps_cond, eps_uncond) for CFG. control: pre-embedded
        ControlNet hint (SD pipelines only)."""
        c, u = cond
        if control is not None:
            eps_c = self._denoiser(x, sigma, c, control=control)
            eps_u = (self._denoiser(x, sigma, u, control=control)
                     if u is not None else eps_c)
            return eps_c, eps_u
        eps_c = self._denoiser(x, sigma, c)
        eps_u = self._denoiser(x, sigma, u) if u is not None else eps_c
        return eps_c, eps_u

    def latent_preview(self, lat: np.ndarray) -> np.ndarray:
        C = lat.shape[-1]
        proj = self._PREVIEW[:C] if C <= 4 else np.eye(C, 3, dtype=np.float32)
        rgb = lat @ proj
        rgb = (rgb - rgb.min()) / max(rgb.max() - rgb.min(), 1e-5)
        return (rgb * 255).astype(np.uint8)

    def downsample_mask(self, mask: np.ndarray, h: int, w: int) -> np.ndarray:
        """mask [H, W] 0..1 (1 = inpaint) -> latent res, inverted to
        keep-weight (1 = keep generated)."""
        from PIL import Image
        m = Image.fromarray((mask * 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR)
        return np.asarray(m, np.float32) / 255.0

    def txt2img_stream(self, p: GenerationParams,
                       control: np.ndarray | None = None) -> StreamState:
        return StreamState(self, p, control=control)

    def img2img_stream(self, p: GenerationParams, image: np.ndarray,
                       mask: np.ndarray | None = None,
                       control: np.ndarray | None = None) -> StreamState:
        return StreamState(self, p, init_image=image, mask=mask,
                           control=control)
