"""Mass/energy conservation over many cycles (`test/conservation.jl`):
drift must stay <= 1e-12 absolute after 10000 cycles."""

import numpy as np
import pytest

from conftest import reference_params

from armon_tpu.core.solver import make_init, make_jit_loop, make_conservation


@pytest.mark.parametrize("test", ["Sod", "Sod_y", "Sod_circ"])
def test_conservation(test):
    params = reference_params(test, np.float64, maxcycle=10000, maxtime=10000.0)
    cons = make_conservation(params)
    state = make_init(params)()
    m0, e0 = map(float, cons(state))

    loop = make_jit_loop(params)
    state, t, cycles, dt, lm, ok = loop(state)
    assert bool(ok) and int(cycles) == 10000

    m1, e1 = map(float, cons(state))
    assert abs(m0 - m1) <= 1e-12
    assert abs(e0 - e1) <= 1e-12
