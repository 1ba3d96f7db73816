"""Exponential moving average of parameters as pure pytree ops.

Reference: models/ema.py EMAHelper (shadow = mu*shadow + (1-mu)*param). Here
EMA state is just a params-shaped pytree updated functionally inside the
jitted train step — no module registry needed.
"""

from __future__ import annotations

import jax


class EMA:
    def __init__(self, mu: float = 0.999):
        self.mu = mu

    def init(self, params):
        return jax.tree_util.tree_map(lambda p: p, params)

    def update(self, shadow, params):
        mu = self.mu
        return jax.tree_util.tree_map(
            lambda s, p: mu * s + (1.0 - mu) * p, shadow, params
        )


def ema_update(shadow, params, mu: float):
    return jax.tree_util.tree_map(lambda s, p: mu * s + (1.0 - mu) * p, shadow, params)
