"""Golden test: our flow-match solvers vs the reference's LITERAL FlowMatchDiscreteScheduler.

Unlike test_scheduler (which pins against a numpy transcription of the reference's state
machine), this drives the reference's actual ``scheduling_flow_match_discrete.py`` code —
imported from /root/reference via tests/reference_oracle — step by step with shared random
model outputs, and asserts identical trajectories for every solver and shift mode.
Reference: ``hunyuanvideo_foley/utils/schedulers/scheduling_flow_match_discrete.py:120-373``.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from foley_tpu.sampling import flow_match
from tests.reference_oracle import import_reference

sched_mod = import_reference(
    "hunyuanvideo_foley.utils.schedulers.scheduling_flow_match_discrete"
)

LATENT_SHAPE = (2, 7, 5)


def _run_reference(solver, num_steps, shift, use_flux_shift, n_tokens, reverse, vs, x0):
    sched = sched_mod.FlowMatchDiscreteScheduler(
        shift=shift,
        solver=solver,
        reverse=reverse,
        use_flux_shift=use_flux_shift,
    )
    sched.set_timesteps(num_steps, device="cpu", n_tokens=n_tokens)
    x = torch.from_numpy(x0.copy())
    traj = []
    for i, t in enumerate(sched.timesteps):
        out = sched.step(torch.from_numpy(vs[i]), t, x)
        x = out.prev_sample
        traj.append(x.numpy().copy())
    return sched, np.stack(traj)


def _run_ours(solver, num_steps, shift, use_flux_shift, n_tokens, reverse, vs, x0):
    sigmas = flow_match.get_sigmas(
        num_steps,
        shift=shift,
        reverse=reverse,
        use_flux_shift=use_flux_shift,
        n_tokens=n_tokens,
    )
    state = flow_match.solver_init(solver, LATENT_SHAPE)
    x = jnp.asarray(x0)
    traj = []
    for i in range(num_steps):
        x, state = flow_match.solver_step(solver, state, jnp.asarray(vs[i]), x, sigmas)
        traj.append(np.asarray(x))
    return sigmas, np.stack(traj)


CASES = [
    # (solver, shift, use_flux_shift, n_tokens, reverse)
    ("euler", 1.0, False, None, True),
    ("euler", 3.0, False, None, True),
    ("euler", 1.0, True, 250, True),
    ("euler", 1.0, False, None, False),
    ("heun-2", 1.0, False, None, True),
    ("heun-2", 5.0, False, None, True),
    ("midpoint-2", 1.0, False, None, True),
    ("midpoint-2", 1.0, True, 750, True),
    ("kutta-4", 1.0, False, None, True),
    ("kutta-4", 2.0, False, None, True),
]


@pytest.mark.parametrize("solver,shift,flux,n_tokens,reverse", CASES)
def test_trajectory_matches_literal_reference(solver, shift, flux, n_tokens, reverse):
    num_steps = 12
    rng = np.random.default_rng(hash((solver, shift, flux)) % 2**32)
    x0 = rng.normal(size=LATENT_SHAPE).astype(np.float32)
    vs = rng.normal(size=(num_steps,) + LATENT_SHAPE).astype(np.float32)

    sched, ref_traj = _run_reference(solver, num_steps, shift, flux, n_tokens, reverse, vs, x0)
    sigmas, our_traj = _run_ours(solver, num_steps, shift, flux, n_tokens, reverse, vs, x0)

    np.testing.assert_allclose(
        np.asarray(sigmas), sched.sigmas.numpy(), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(our_traj, ref_traj, atol=1e-5, rtol=1e-5)


def test_timestep_surfaces_match_literal_reference():
    sched = sched_mod.FlowMatchDiscreteScheduler(shift=3.0, solver="euler")
    sched.set_timesteps(17, device="cpu")
    sigmas = flow_match.get_sigmas(17, shift=3.0)
    np.testing.assert_allclose(
        np.asarray(flow_match.get_timesteps(sigmas)),
        sched.timesteps.numpy(),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(flow_match.get_timesteps_full(sigmas)),
        sched.timesteps_full.numpy(),
        atol=1e-4,
    )
    # scale_model_input is the identity on both sides (reference :195-196).
    x = jnp.arange(6.0).reshape(2, 3)
    assert (flow_match.scale_model_input(x, 5) == x).all()
    xt = torch.arange(6.0).reshape(2, 3)
    assert torch.equal(sched.scale_model_input(xt, 5), xt)
