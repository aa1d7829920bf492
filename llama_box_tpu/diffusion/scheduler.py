"""Diffusion noise schedules + samplers (k-diffusion formulation).

Reproduces the sampling semantics the reference gets from
stable-diffusion.cpp's streamed samplers (z_stablediffusion.hpp:257-335):
one externally-driven step at a time so the serving loop can interleave
diffusion steps with LLM decode passes and stream previews.

Model convention: denoiser(latents, sigma, cond) predicts epsilon at the
given sigma (eps-prediction; v-prediction folds in via the caller).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    n_train: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    kind: str = "scaled_linear"  # SD default

    def alphas_cumprod(self) -> np.ndarray:
        if self.kind == "scaled_linear":
            betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                                self.n_train) ** 2
        else:
            betas = np.linspace(self.beta_start, self.beta_end, self.n_train)
        return np.cumprod(1.0 - betas)

    def sigmas(self) -> np.ndarray:
        ac = self.alphas_cumprod()
        return np.sqrt((1.0 - ac) / ac)


def make_sigmas(schedule: NoiseSchedule, n_steps: int,
                karras: bool = False,
                method: str | None = None) -> np.ndarray:
    """Sigma ladder for n_steps (descending), with a trailing 0.
    method: "discrete" (default), "karras", or "exponential" (the
    reference's --image-schedule-method values sd.cpp implements)."""
    method = method or ("karras" if karras else "discrete")
    train_sigmas = schedule.sigmas()
    smin, smax = train_sigmas[0], train_sigmas[-1]
    if method == "karras":
        rho = 7.0
        ramp = np.linspace(0, 1, n_steps)
        sig = (smax ** (1 / rho)
               + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    elif method == "exponential":
        sig = np.exp(np.linspace(np.log(smax), np.log(smin), n_steps))
    else:
        idx = np.linspace(len(train_sigmas) - 1, 0, n_steps)
        sig = np.interp(idx, np.arange(len(train_sigmas)), train_sigmas)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def _to_denoised(x, eps, sigma):
    """eps-prediction -> denoised sample (x0 estimate)."""
    return x - sigma * eps


def step_euler(denoiser, x, sigmas, i, rng, cond):
    sigma, sigma_next = sigmas[i], sigmas[i + 1]
    eps = denoiser(x, sigma, cond)
    denoised = _to_denoised(x, eps, sigma)
    d = (x - denoised) / sigma
    return x + d * (sigma_next - sigma)


def step_euler_a(denoiser, x, sigmas, i, rng, cond):
    sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
    eps = denoiser(x, sigma, cond)
    denoised = _to_denoised(x, eps, sigma)
    if sigma_next == 0:
        return denoised
    sigma_up = min(sigma_next, (sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
                                / sigma ** 2) ** 0.5)
    sigma_down = (sigma_next ** 2 - sigma_up ** 2) ** 0.5
    d = (x - denoised) / sigma
    x = x + d * (sigma_down - sigma)
    noise = jnp.asarray(rng.standard_normal(x.shape), x.dtype)
    return x + noise * sigma_up


def step_heun(denoiser, x, sigmas, i, rng, cond):
    """Heun's 2nd-order method (two model calls per step)."""
    sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
    eps = denoiser(x, sigma, cond)
    denoised = _to_denoised(x, eps, sigma)
    d = (x - denoised) / sigma
    if sigma_next == 0:
        return denoised
    x2 = x + d * (sigma_next - sigma)
    eps2 = denoiser(x2, sigma_next, cond)
    denoised2 = _to_denoised(x2, eps2, sigma_next)
    d2 = (x2 - denoised2) / sigma_next
    return x + 0.5 * (d + d2) * (sigma_next - sigma)


class _Dpmpp2mState:
    def __init__(self):
        self.old_denoised = None


def step_dpmpp_2m(denoiser, x, sigmas, i, rng, cond, state=None):
    sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
    eps = denoiser(x, sigma, cond)
    denoised = _to_denoised(x, eps, sigma)
    t, t_next = -np.log(sigma), -np.log(max(sigma_next, 1e-10))
    h = t_next - t
    if sigma_next == 0:
        x = denoised
    elif state is None or state.old_denoised is None:
        x = (sigma_next / sigma) * x - np.expm1(-h) * denoised
    else:
        h_last = state.h_last
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised \
            - (1 / (2 * r)) * state.old_denoised
        x = (sigma_next / sigma) * x - np.expm1(-h) * denoised_d
    if state is not None:
        state.old_denoised = denoised
        state.h_last = h
    return x


SAMPLERS = {
    "euler": step_euler,
    "euler_a": step_euler_a,
    "heun": step_heun,
    "dpm++2m": step_dpmpp_2m,
}

# sd.cpp sampler names we accept but map to the closest implemented
# stepper (a warning is logged at the mapping site)
SAMPLER_ALIASES = {
    "dpm2": "heun",
    "dpm++2s_a": "euler_a",
    "dpm++2mv2": "dpm++2m",
    "ipndm": "euler",
    "ipndm_v": "euler",
    "lcm": "euler",
    "ddim_trailing": "euler",
    "tcd": "euler",
}


def resolve_sampler(name: str) -> str:
    """Canonical stepper name for a requested sampler (known sd.cpp
    aliases map to the closest implemented one). Raises ValueError for
    names that are neither implemented nor known aliases."""
    name = (name or "euler").lower().replace("euler_ancestral", "euler_a")
    if name in SAMPLERS:
        return name
    if name in SAMPLER_ALIASES:
        return SAMPLER_ALIASES[name]
    raise ValueError(f"unknown sampler {name!r}; choose from "
                     f"{sorted(SAMPLERS) + sorted(SAMPLER_ALIASES)}")
