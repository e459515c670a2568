"""Flow-match scheduler tests: closed-form checks + a transcription of the reference's
stateful step machine (scheduling_flow_match_discrete.py) run side by side in numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foley_tpu.sampling import (
    SUPPORTED_SOLVERS,
    get_sigmas,
    solver_init,
    solver_step,
)
from foley_tpu.sampling.flow_match import get_timesteps


def test_sigmas_linspace():
    s = get_sigmas(50)
    np.testing.assert_allclose(np.asarray(s), np.linspace(1, 0, 51), atol=1e-6)
    t = get_timesteps(s)
    assert t.shape == (50,)
    np.testing.assert_allclose(np.asarray(t[0]), 1000.0, atol=1e-4)


def test_sd3_shift():
    shift = 3.0
    s = np.asarray(get_sigmas(10, shift=shift))
    base = np.linspace(1, 0, 11)
    expected = shift * base / (1 + (shift - 1) * base)
    np.testing.assert_allclose(s, expected, atol=1e-6)


def test_flux_shift_runs():
    s = np.asarray(get_sigmas(10, use_flux_shift=True, n_tokens=250))
    assert s[0] == pytest.approx(1.0, abs=1e-6)
    assert s[-1] == pytest.approx(0.0, abs=1e-6)
    assert np.all(np.diff(s) < 0)


class ReferenceStepper:
    """Numpy transcription of the reference FlowMatchDiscreteScheduler.step state machine
    (scheduling_flow_match_discrete.py:210-373) for cross-validation."""

    def __init__(self, sigmas, solver):
        self.sigmas = np.asarray(sigmas, np.float32)
        self.solver = solver
        self.step_index = 0
        self.d1 = self.d2 = self.d3 = None
        self.dt = None
        self.sample = None

    def step(self, v, sample):
        sigma = self.sigmas[self.step_index]
        sigma_next = self.sigmas[self.step_index + 1]
        last = True
        if self.solver == "euler":
            derivative, dt = v, sigma_next - sigma
        elif self.solver in ("heun-2", "midpoint-2"):
            if self.d1 is None:
                self.d1, self.dt, self.sample = v, sigma_next - sigma, sample
                derivative = v
                dt = self.dt if self.solver == "heun-2" else self.dt / 2
                last = False
            else:
                derivative = 0.5 * (self.d1 + v) if self.solver == "heun-2" else v
                dt, sample = self.dt, self.sample
                self.d1 = self.dt = self.sample = None
        else:  # kutta-4
            if self.d1 is None:
                self.d1, self.dt, self.sample = v, sigma_next - sigma, sample
                derivative, dt, last = v, self.dt / 2, False
            elif self.d2 is None:
                self.d2 = v
                derivative, dt, last = v, self.dt / 2, False
            elif self.d3 is None:
                self.d3 = v
                derivative, dt, last = v, self.dt, False
            else:
                derivative = self.d1 / 6 + self.d2 / 3 + self.d3 / 3 + v / 6
                dt, sample = self.dt, self.sample
                self.d1 = self.d2 = self.d3 = self.dt = self.sample = None
        prev = sample + derivative * dt
        if last:
            self.step_index += 1
        return prev


@pytest.mark.parametrize("solver", SUPPORTED_SOLVERS)
def test_solver_matches_reference_state_machine(solver):
    rng = np.random.default_rng(0)
    steps = 8
    sigmas = get_sigmas(steps)
    shape = (1, 6, 4)
    ref = ReferenceStepper(np.asarray(sigmas), solver)
    state = solver_init(solver, shape)
    sample_ref = rng.normal(size=shape).astype(np.float32)
    sample_jax = jnp.asarray(sample_ref)
    for i in range(steps):
        v = rng.normal(size=shape).astype(np.float32)
        sample_ref = ref.step(v, sample_ref)
        sample_jax, state = solver_step(solver, state, jnp.asarray(v), sample_jax, sigmas)
        np.testing.assert_allclose(np.asarray(sample_jax), sample_ref, atol=1e-5, rtol=1e-5)
    assert int(state.step_index) == ref.step_index


def test_euler_closed_form_integrates_constant_velocity():
    """With constant velocity v, Euler over the full schedule moves x by -v exactly."""
    steps = 10
    sigmas = get_sigmas(steps)
    shape = (2, 3)
    x0 = jnp.ones(shape)
    v = jnp.full(shape, 2.0)
    state = solver_init("euler", shape)
    x = x0
    for _ in range(steps):
        x, state = solver_step("euler", state, v, x, sigmas)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0 - 2.0), atol=1e-5)


def test_solver_step_scannable():
    """solver_step must work as a lax.scan body (fixed-shape carry)."""
    steps = 6
    sigmas = get_sigmas(steps)
    shape = (1, 4)

    def body(carry, _):
        x, state = carry
        v = -x  # toy velocity field
        x, state = solver_step("heun-2", state, v, x, sigmas)
        return (x, state), None

    x0 = jnp.ones(shape)
    (xf, state), _ = jax.lax.scan(body, (x0, solver_init("heun-2", shape)), None, length=steps)
    assert xf.shape == shape
    assert int(state.step_index) == steps // 2  # heun consumes 2 evals per interval


def test_interpolant_sigma_stage_positions():
    """interpolant_sigma: the clamp sigma tracks the sample's nominal position —
    interval boundary at stage 0 (post-increment), the solver's stage position
    mid-interval (heun-2 predictor at the end, midpoint-2 at the midpoint, kutta-4 at
    mid/mid/end)."""
    import jax.numpy as jnp
    import numpy as np

    from foley_tpu.sampling.flow_match import SolverState, get_sigmas, interpolant_sigma

    sigmas = get_sigmas(4)  # [1.0, 0.75, 0.5, 0.25, 0.0]

    def state(stage, step):
        z = jnp.zeros((1, 2, 2), jnp.float32)
        return SolverState(stage=jnp.int32(stage), step_index=jnp.int32(step),
                           d1=z, d2=z, d3=z, saved_sample=z, dt=jnp.float32(0.0))

    assert float(interpolant_sigma("euler", state(0, 1), sigmas)) == 0.75
    # heun-2: stage 1 = predictor at the interval END
    np.testing.assert_allclose(float(interpolant_sigma("heun-2", state(1, 0), sigmas)), 0.75)
    np.testing.assert_allclose(float(interpolant_sigma("heun-2", state(0, 1), sigmas)), 0.75)
    # midpoint-2: stage 1 = midpoint of the open interval
    np.testing.assert_allclose(
        float(interpolant_sigma("midpoint-2", state(1, 0), sigmas)), 0.875)
    # kutta-4: mid, mid, end
    np.testing.assert_allclose(float(interpolant_sigma("kutta-4", state(1, 0), sigmas)), 0.875)
    np.testing.assert_allclose(float(interpolant_sigma("kutta-4", state(2, 0), sigmas)), 0.875)
    np.testing.assert_allclose(float(interpolant_sigma("kutta-4", state(3, 0), sigmas)), 0.75)
