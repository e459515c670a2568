"""Discrete flow-matching ODE solvers as pure functions.

Behavioral contract = the reference ``FlowMatchDiscreteScheduler``
(``utils/schedulers/scheduling_flow_match_discrete.py``):

- sigmas: ``linspace(1, 0, steps+1)``; optional SD3 shift ``s*t / (1+(s-1)t)`` (:207-208) or
  flux token-count shift (:197-205); timesteps fed to the model are ``sigmas[:-1] * 1000``.
- all step math in fp32 (:262-264).
- solvers: euler / heun-2 / midpoint-2 / kutta-4 (:77-83). The multi-stage solvers are
  *stateful across ``step()`` calls*: each call consumes one model evaluation and only the
  last inner stage advances the sigma index (:286-287). The reference's driver loop runs one
  ``step()`` per entry of the timestep list, so heun-2/kutta-4 cover only 1/2 / 1/4 of the
  schedule in a fixed step budget — reproduced exactly here (the reference UI itself notes
  "only Euler seems decent", ``nodes.py:227``).

TPU-first re-design: the Python-side mutable state (``derivative_1/2/3``, ``dt``, ``sample``)
becomes an explicit fixed-shape ``SolverState`` carry so the whole denoise loop is a single
jitted ``lax.scan`` (no per-step host round-trips, no recompiles).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

SUPPORTED_SOLVERS = ("euler", "heun-2", "midpoint-2", "kutta-4")

_SOLVER_STAGES = {"euler": 1, "heun-2": 2, "midpoint-2": 2, "kutta-4": 4}


def get_sigmas(
    num_steps: int,
    shift: float = 1.0,
    reverse: bool = True,
    use_flux_shift: bool = False,
    flux_base_shift: float = 0.5,
    flux_max_shift: float = 1.15,
    n_tokens: Optional[int] = None,
) -> jnp.ndarray:
    """[num_steps+1] fp32 sigma schedule."""
    sigmas = jnp.linspace(1.0, 0.0, num_steps + 1, dtype=jnp.float32)
    if use_flux_shift:
        assert n_tokens is not None, "n_tokens required for flux shift"
        m = (flux_max_shift - flux_base_shift) / (4096 - 256)
        b = flux_base_shift - m * 256
        mu = m * n_tokens + b
        sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    elif shift != 1.0:
        sigmas = (shift * sigmas) / (1.0 + (shift - 1.0) * sigmas)
    if not reverse:
        sigmas = 1.0 - sigmas
    return sigmas


def get_timesteps(sigmas: jnp.ndarray, num_train_timesteps: int = 1000) -> jnp.ndarray:
    """Model-facing timesteps: sigmas[:-1] * 1000 (reference :160)."""
    return (sigmas[:-1] * num_train_timesteps).astype(jnp.float32)


def get_timesteps_full(sigmas: jnp.ndarray, num_train_timesteps: int = 1000) -> jnp.ndarray:
    """All steps+1 boundary timesteps: sigmas * 1000 (reference ``timesteps_full``, :161)."""
    return (sigmas * num_train_timesteps).astype(jnp.float32)


def scale_model_input(sample: jnp.ndarray, timestep=None) -> jnp.ndarray:
    """Identity, kept for scheduler API parity (reference :195-196)."""
    del timestep
    return sample


class SolverState(NamedTuple):
    """Fixed-shape carry for multi-stage solvers.

    ``stage``: inner-stage counter in [0, stages); ``step_index``: completed sigma intervals;
    ``d1/d2/d3``: stored derivatives; ``saved_sample``: the sample at the interval start;
    ``dt``: the full interval width saved at stage 0.
    """

    stage: jnp.ndarray        # int32 scalar
    step_index: jnp.ndarray   # int32 scalar
    d1: jnp.ndarray
    d2: jnp.ndarray
    d3: jnp.ndarray
    saved_sample: jnp.ndarray
    dt: jnp.ndarray           # fp32 scalar


def solver_init(solver: str, latent_shape: Tuple[int, ...]) -> SolverState:
    if solver not in SUPPORTED_SOLVERS:
        raise ValueError(f"Solver {solver!r} not supported; supported: {SUPPORTED_SOLVERS}")
    zeros = jnp.zeros(latent_shape, jnp.float32)
    return SolverState(
        stage=jnp.zeros((), jnp.int32),
        step_index=jnp.zeros((), jnp.int32),
        d1=zeros,
        d2=zeros,
        d3=zeros,
        saved_sample=zeros,
        dt=jnp.zeros((), jnp.float32),
    )


def solver_step(
    solver: str,
    state: SolverState,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    sigmas: jnp.ndarray,
) -> Tuple[jnp.ndarray, SolverState]:
    """One scheduler ``step()``: consumes one model evaluation, returns (prev_sample, state).

    All math in fp32 (inputs are cast). ``sigmas`` is the full [steps+1] schedule; the current
    interval is looked up via ``state.step_index`` exactly like the reference's
    ``self.sigmas[self.step_index]`` (:267-268).
    """
    sample = sample.astype(jnp.float32)
    v = model_output.astype(jnp.float32)
    sigma = jnp.take(sigmas, state.step_index)
    sigma_next = jnp.take(sigmas, state.step_index + 1)
    interval = sigma_next - sigma  # negative for the reverse schedule

    if solver == "euler":
        prev = sample + v * interval
        new_state = state._replace(step_index=state.step_index + 1)
        return prev, new_state

    if solver in ("heun-2", "midpoint-2"):
        def stage0(_):
            dt = interval if solver == "heun-2" else interval / 2
            prev = sample + v * dt
            return prev, state._replace(
                stage=jnp.int32(1), d1=v, saved_sample=sample, dt=interval
            )

        def stage1(_):
            if solver == "heun-2":
                derivative = 0.5 * (state.d1 + v)
            else:  # midpoint-2
                derivative = v
            prev = state.saved_sample + derivative * state.dt
            return prev, state._replace(
                stage=jnp.int32(0),
                step_index=state.step_index + 1,
                d1=jnp.zeros_like(v),
                saved_sample=jnp.zeros_like(sample),
                dt=jnp.float32(0.0),
            )

        return jax.lax.cond(state.stage == 0, stage0, stage1, None)

    if solver == "kutta-4":
        def stage0(_):
            prev = sample + v * (interval / 2)
            return prev, state._replace(stage=jnp.int32(1), d1=v, saved_sample=sample, dt=interval)

        def stage1(_):
            prev = sample + v * (state.dt / 2)
            return prev, state._replace(stage=jnp.int32(2), d2=v)

        def stage2(_):
            prev = sample + v * state.dt
            return prev, state._replace(stage=jnp.int32(3), d3=v)

        def stage3(_):
            derivative = (state.d1 + 2 * state.d2 + 2 * state.d3 + v) / 6.0
            prev = state.saved_sample + derivative * state.dt
            return prev, state._replace(
                stage=jnp.int32(0),
                step_index=state.step_index + 1,
                d1=jnp.zeros_like(v),
                d2=jnp.zeros_like(v),
                d3=jnp.zeros_like(v),
                saved_sample=jnp.zeros_like(sample),
                dt=jnp.float32(0.0),
            )

        return jax.lax.switch(state.stage, [stage0, stage1, stage2, stage3], None)

    raise ValueError(f"Solver {solver!r} not supported; supported: {SUPPORTED_SOLVERS}")


def solver_stages(solver: str) -> int:
    return _SOLVER_STAGES[solver]


#: Nominal position (fraction of the current sigma interval) of the sample RETURNED by a
#: solver_step that left the state at inner stage ``s`` — the sigma at which the flow-match
#: interpolant should be evaluated when clamping a known prefix between stages
#: (``denoise.py::denoise_latents`` known_frames). Stage 0 means "interval boundary just
#: completed" (step_index already advanced), so the fraction is 0 of the NEW interval.
#: heun-2's predictor lands at the interval end; midpoint-2's at the midpoint; kutta-4
#: uses the classical RK4 stage positions (mid, mid, end) — the clamp sigma is our design
#: choice (the reference has no windowed mode), the free-region math stays oracle-pinned.
_STAGE_FRACS = {
    "euler": (0.0,),
    "heun-2": (0.0, 1.0),
    "midpoint-2": (0.0, 0.5),
    "kutta-4": (0.0, 0.5, 0.5, 1.0),
}


def interpolant_sigma(solver: str, state: SolverState, sigmas: jnp.ndarray) -> jnp.ndarray:
    """Effective sigma of the sample a ``solver_step`` just returned, given the POST-step
    ``state``: the sigma to clamp a known prefix's interpolant at. For euler this is
    ``sigmas[step_index]`` (each call completes one interval); multi-stage solvers sit at
    an intermediate position of the still-open interval while ``state.stage > 0``."""
    sig0 = jnp.take(sigmas, state.step_index)
    if solver == "euler":
        return sig0
    fracs = jnp.asarray(_STAGE_FRACS[solver], jnp.float32)
    sig1 = jnp.take(sigmas, state.step_index + 1)
    return sig0 + jnp.take(fracs, state.stage) * (sig1 - sig0)
