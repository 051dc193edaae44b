from .shifts import sh
from . import eos, riemann, limiters, update, projection, boundary, reductions, init
