from .enums import Axis, Side, axis_of, opposite_of, first_side, sides_along, is_first_side
from .errors import SolverException, solver_error
