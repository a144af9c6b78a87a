"""Loss balancing (fixed weights and ReLoBRaLo) as explicit jit-carried state.

The reference implements these as stateful ``nn.Module`` buffers
(``models/losses.py:23-124``). TPU-first they become pure functions:
``scaler.init_state()`` creates the carried state and
``scaler(state, losses, step, rng)`` returns ``(weights, new_state)``; the
weights are treated as constants w.r.t. the parameters (the reference computes
lambdas under ``no_grad``), so callers apply them to a stop-gradient copy-free
``weights * losses`` sum.
"""
from __future__ import annotations

import dataclasses


import flax.struct
import jax
import jax.numpy as jnp


class LossScaler:
    """Identity scaler (reference ``LossScaler``, losses.py:23-36)."""

    def init_state(self):
        return None

    def __call__(self, state, losses, step, rng):
        return jnp.ones_like(losses), state


@dataclasses.dataclass(frozen=True)
class FixedLossScaler(LossScaler):
    """Fixed per-loss coefficients (reference losses.py:39-61).

    Weights dict keys in order: continuity, momentum, boundary, observations.
    """
    weights: tuple[float, ...]

    @classmethod
    def from_dict(cls, loss_weights: dict[str, list]) -> "FixedLossScaler":
        w = list(loss_weights["continuity"])
        w.extend(loss_weights["momentum"])
        w.extend(loss_weights["boundary"])
        if "observations" in loss_weights:
            w.extend(loss_weights["observations"])
        return cls(tuple(float(x) for x in w))

    def __call__(self, state, losses, step, rng):
        return jnp.asarray(self.weights, dtype=losses.dtype), state


@flax.struct.dataclass
class RelobraloState:
    init_losses: jnp.ndarray
    prev_losses: jnp.ndarray
    lambda_ema: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RelobraloScaler(LossScaler):
    """ReLoBRaLo random-lookback loss balancing (reference losses.py:64-124,
    adapted from NVIDIA physicsnemo-sym). As in the reference, ``alpha`` is
    (1 - alpha) w.r.t. the original paper, and losses are accumulated over an
    update period and averaged to compute weights.

    :param update_period: steps between weight updates. The reference uses the
        dataloader batch size (losses.py:100); pass steps-per-epoch for true
        per-epoch averaging.
    """
    num_losses: int
    alpha: float = 0.95
    beta: float = 0.99
    tau: float = 1.0
    eps: float = 1e-8
    update_period: int = 1

    def init_state(self) -> RelobraloState:
        # distinct buffers: donated states must not alias
        return RelobraloState(jnp.zeros((self.num_losses,), jnp.float32),
                              jnp.zeros((self.num_losses,), jnp.float32),
                              jnp.ones((self.num_losses,), jnp.float32))

    def __call__(self, state: RelobraloState, losses, step, rng):
        losses = jax.lax.stop_gradient(losses.astype(jnp.float32))
        period = self.update_period

        def first_step(s):
            return jnp.ones_like(losses), RelobraloState(losses, losses, s.lambda_ema)

        def update(s):
            prev = s.prev_losses / period
            norm_prev = jnp.max(losses / (self.tau * prev))
            norm_init = jnp.max(losses / (self.tau * s.init_losses))
            rho = jax.random.bernoulli(rng, self.beta).astype(jnp.float32)
            lam_prev = jnp.exp(losses / (self.tau * prev + self.eps) - norm_prev)
            lam_init = jnp.exp(losses / (self.tau * s.init_losses + self.eps) - norm_init)
            lam_prev = lam_prev * self.num_losses / (jnp.sum(lam_prev) + self.eps)
            lam_init = lam_init * self.num_losses / (jnp.sum(lam_init) + self.eps)
            lam = self.alpha * (rho * s.lambda_ema + (1.0 - rho) * lam_init)
            lam = lam + (1.0 - self.alpha) * lam_prev
            return lam, RelobraloState(s.init_losses, losses, lam)

        def accumulate(s):
            return s.lambda_ema, RelobraloState(
                s.init_losses, s.prev_losses + losses, s.lambda_ema)

        def later(s):
            return jax.lax.cond(step % period == 0, update, accumulate, s)

        return jax.lax.cond(step == 0, first_step, later, state)


def make_loss_scaler(name: str | None, num_losses: int, weights: dict | None = None,
                     alpha: float = 0.005, update_period: int = 1) -> LossScaler:
    """Factory matching the reference CLI contract (--loss-scaler fixed|relobralo)."""
    if name in (None, "none"):
        return LossScaler()
    if name == "fixed":
        if weights is None:
            return LossScaler()
        return FixedLossScaler.from_dict(weights)
    if name == "relobralo":
        return RelobraloScaler(num_losses, alpha=alpha, update_period=update_period)
    raise ValueError(f"Unknown loss scaler {name}")
