"""Test configuration: run everything on a virtual 8-device CPU mesh with
x64 enabled — multi-chip sharding is validated without TPU hardware, exactly
as the reference oversubscribes MPI ranks on one node (`test/mpi.jl:133-141`).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin self-registers via sitecustomize and overrides
# JAX_PLATFORMS; the config update below wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

REFERENCE_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "reference_data")


def reference_params(test, dtype, **overrides):
    """The golden-run configuration
    (`test/reference_data/reference_functions.jl:7-19`)."""
    from armon_tpu import ArmonParameters
    options = dict(
        data_type=dtype,
        test=test, scheme="GAD", projection="euler_2nd",
        riemann_limiter="minmod",
        nghost=4, N=(100, 100),
        maxcycle=1000,
        silent=5, write_output=False, measure_time=False,
    )
    options.update(overrides)
    return ArmonParameters(**options)


def ref_file(test_name, dtype):
    bits = np.dtype(dtype).itemsize * 8
    return os.path.join(REFERENCE_DATA, f"ref_{test_name}_{bits}bits.csv")


# Tolerance ladder (`reference_functions.jl:55-58`)
def abs_tol(dtype):
    return 1e-13 if np.dtype(dtype).itemsize == 8 else 1e-5


def rel_tol(dtype):
    return (4 * np.finfo(np.float64).eps if np.dtype(dtype).itemsize == 8
            else 20 * np.finfo(np.float32).eps)
