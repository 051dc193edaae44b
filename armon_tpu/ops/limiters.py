"""Flux limiters (`src/limiters.jl:2-15`)."""

import jax.numpy as jnp

from ..utils.errors import solver_error


def no_limiter(r):
    return jnp.ones_like(r)


def minmod(r):
    return jnp.maximum(0.0, jnp.minimum(1.0, r))


def superbee(r):
    return jnp.maximum(jnp.maximum(0.0, jnp.minimum(2.0 * r, 1.0)),
                       jnp.minimum(r, 2.0))


_LIMITERS = {"no_limiter": no_limiter, "minmod": minmod, "superbee": superbee}


def limiter_from_name(name: str):
    try:
        return _LIMITERS[str(name)]
    except KeyError:
        solver_error("config", f"Unknown limiter name: '{name}'")
