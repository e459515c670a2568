from foley_tpu.sampling.flow_match import (
    SUPPORTED_SOLVERS,
    SolverState,
    get_sigmas,
    solver_init,
    solver_step,
)

__all__ = [
    "SUPPORTED_SOLVERS",
    "SolverState",
    "get_sigmas",
    "solver_init",
    "solver_step",
]
