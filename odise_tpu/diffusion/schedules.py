"""Beta schedules and timestep respacing.

Capability parity with the reference's diffusion schedule utilities
(reference odise/modeling/diffusion/gaussian_diffusion.py:105-135 and
odise/modeling/diffusion/respace.py:15-59), re-derived from the standard
DDPM/DDIM math as pure NumPy (schedules are static compile-time constants).

Schedules:
  * ``linear``      — DDPM linear betas, scaled for the step count.
  * ``cosine``      — improved-DDPM squared-cosine alphā schedule.
  * ``ldm_linear``  — Stable Diffusion's sqrt-space linear schedule
                      (linspace(sqrt(0.00085), sqrt(0.012))**2); this is the
                      schedule ODISE uses for the frozen SD feature extractor.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence, Set, Union

import numpy as np

__all__ = ["get_named_beta_schedule", "space_timesteps"]


def _betas_for_alpha_bar(num_steps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float64)


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """Return betas (float64, shape [T]) for a named schedule."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "ldm_linear":
        # Stable Diffusion / CompVis LDM: linear in sqrt(beta) space, no
        # step-count rescale (SD is always defined at T=1000).
        return (
            np.linspace(
                0.00085**0.5, 0.012**0.5, num_diffusion_timesteps, dtype=np.float64
            )
            ** 2
        )
    if schedule_name == "cosine":
        return _betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """Choose a subset of original diffusion timesteps for respaced sampling.

    String forms:
      * ``"ddimN"``     — N steps with the fixed-stride DDIM spacing.
      * ``"ldm_ddimN"`` — same, but every chosen step is offset by +1 so that
        the respaced alphas match CompVis/SD's DDIM implementation exactly.
      * ``"N"`` or list — per-section even spacing (improved-DDPM style).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ldm_ddim"):
            desired_count = int(section_counts[len("ldm_ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    # offset by +1 to match SD's ddim timestep table
                    return set(x + 1 for x in range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired_count} steps with an integer stride")
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired_count} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += stride
        all_steps += taken
        start_idx += size
    return set(all_steps)
