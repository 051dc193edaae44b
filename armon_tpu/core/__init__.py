from .state import State
from .config import SolverConfig
