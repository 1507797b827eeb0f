"""MAP optimization — "optimizers are just 0 Kelvin samplers".

Parity: reference `montecosmo/samplers.py:679-696` (Adam on the potential).
Implemented on optax; the whole loop compiles as one lax.scan on device.
"""
import optax
from jax import jit, lax, numpy as jnp, value_and_grad

import jax


def optimize(potential, start, lr0=0.1, n_epochs=100, scan=True):
    """Minimize `potential` with Adam and a 1/sqrt(t) learning-rate decay.

    Returns (params, list/array of potential values).
    """
    schedule = lambda i: lr0 / jnp.sqrt(1.0 + i)
    opt = optax.adam(schedule)

    @jit
    def step(carry, _):
        params, opt_state = carry
        value, grads = value_and_grad(potential)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    opt_state = opt.init(start)
    if scan:
        (params, _), values = lax.scan(step, (start, opt_state), None,
                                       length=n_epochs)
        return params, values

    values = []
    carry = (start, opt_state)
    for _ in range(n_epochs):
        carry, value = step(carry, None)
        values.append(float(value))
    return carry[0], values
