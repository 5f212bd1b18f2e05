"""Optimizers — Adam + Lookahead wrapper as optax transforms.

Re-design of `utils/general_utils.py:108-157` (Lookahead over Adam,
enabled by `--enable_lookahead`): every `k` fast steps, the slow weights
move `alpha` of the way toward the fast weights and the fast weights are
reset to the slow ones. Implemented as a pure optax GradientTransformation
(state = slow params + step counter).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LookaheadState(NamedTuple):
    slow: optax.Params
    step: jnp.ndarray


def lookahead(k: int = 5, alpha: float = 0.5) -> optax.GradientTransformation:
    """Wrap updates so the *applied* params implement Lookahead.

    Must be the LAST transform in the chain; it inspects params (requires
    `optax.apply_updates` semantics: new_params = params + updates).
    """

    def init(params):
        return LookaheadState(slow=jax.tree.map(jnp.asarray, params), step=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        assert params is not None, "lookahead requires params"
        step = state.step + 1
        sync = step % k == 0

        new_slow = jax.tree.map(
            lambda u, p, s: jnp.where(sync, s + alpha * (p + u - s), s),
            updates,
            params,
            state.slow,
        )
        new_updates = jax.tree.map(
            lambda u, p, ns: jnp.where(sync, ns, p + u) - p,
            updates,
            params,
            new_slow,
        )
        return new_updates, LookaheadState(slow=new_slow, step=step)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    enable_lookahead: bool = False,
    lookahead_k: int = 5,
    lookahead_alpha: float = 0.5,
) -> optax.GradientTransformation:
    """Adam(+wd) with optional Lookahead — `maxk_gnn_integrated.py` optimizer
    setup (Adam, `--enable_lookahead`, `utils/config.py`)."""
    if weight_decay > 0:
        base = optax.adamw(lr, weight_decay=weight_decay)
    else:
        base = optax.adam(lr)
    if enable_lookahead:
        return optax.chain(base, lookahead(lookahead_k, lookahead_alpha))
    return base
