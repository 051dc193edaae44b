"""Solver errors.

Mirrors `SolverException` + `solver_error` of the reference
(`src/utils.jl:89-113`): errors are categorized so tests and callers can
distinguish configuration errors from runtime (time-step) errors.
"""


class SolverException(Exception):
    """Exception raised by the solver. `category` is one of
    ``:config`` (invalid parameters), ``:time`` (invalid time step),
    ``:cpp`` (native-extension error)."""

    def __init__(self, category: str, msg: str):
        self.category = category
        super().__init__(f"[{category}] {msg}")


def solver_error(category: str, msg: str):
    raise SolverException(category, msg)
