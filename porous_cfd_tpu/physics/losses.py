"""Physics residuals and losses for the Navier-Stokes-Darcy-Forchheimer system.

Functional counterparts of the reference loss modules (``models/losses.py``):

  * continuity (raw / standardized):           div(u) = tr(J_u)
  * momentum (manufactured / fixed / variable) residual:
        (u . grad) u  -  nu lap(u)  +  grad p  +  u (d nu + 1/2 |u| f) * zone  [- forcing]
    with chain-rule factors undoing z-score standardization where applicable
    (``models/losses.py:256-266, 301-311``).

Each loss exposes ``residual(...)`` (the reference modules' ``func``) and is a
callable returning the per-component MSE against zero. All are frozen pytree
dataclasses so scaler statistics ride through jit as leaves.
"""
from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp

from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.data.scalers import Normalizer, StandardScaler


def mse(x, y):
    return jnp.mean((x - y) ** 2)


def mae(x, y):
    return jnp.mean(jnp.abs(x - y))


def vector_loss(x: jnp.ndarray, y: jnp.ndarray, loss_fn: str = "mse") -> jnp.ndarray:
    """Per-component loss over the last axis (reference ``losses.py:10-20``).

    :return: ``(D,)`` vector of per-component means.
    """
    err = (x - y) ** 2 if loss_fn == "mse" else jnp.abs(x - y)
    return jnp.mean(err.reshape(-1, err.shape[-1]), axis=0)


def _u_source(u_raw, d, f, nu):
    """Darcy-Forchheimer penalization source: u (d nu + 1/2 |u| f)."""
    u_mag = jnp.linalg.norm(u_raw, axis=-1, keepdims=True)
    return u_raw * (d * nu + 0.5 * u_mag * f)


# ---------------------------------------------------------------------------
# Continuity
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ContinuityLoss:
    """div(u) residual on raw (unscaled) outputs (``losses.py:149-164``)."""

    def residual(self, u_jac: jnp.ndarray) -> jnp.ndarray:
        diag = jnp.diagonal(u_jac, axis1=-2, axis2=-1)  # (..., N, D)
        return jnp.sum(diag, axis=-1)

    def __call__(self, u_jac: jnp.ndarray) -> jnp.ndarray:
        r = self.residual(u_jac)
        return mse(r, jnp.zeros_like(r))

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ContinuityLossStandardized:
    """div(u) residual with standardization chain rule (``losses.py:167-190``)."""
    u_scaler: StandardScaler
    points_scaler: StandardScaler

    def residual(self, u_jac: jnp.ndarray) -> jnp.ndarray:
        diag = jnp.diagonal(u_jac, axis1=-2, axis2=-1)
        diag = diag * self.u_scaler.std / self.points_scaler.std
        return jnp.sum(diag, axis=-1)

    def __call__(self, u_jac: jnp.ndarray) -> jnp.ndarray:
        r = self.residual(u_jac)
        return mse(r, jnp.zeros_like(r))

    def tree_flatten(self):
        return (self.u_scaler, self.points_scaler), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# ---------------------------------------------------------------------------
# Momentum
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MomentumLossManufactured:
    """Raw-coordinate NS-Darcy momentum residual with analytic forcing
    (``losses.py:193-225``): residual = (u.grad)u - nu sum_j d2u/dxj2 + grad p
    + source * cellToRegion - f."""
    nu: float
    d: float
    f: float

    def residual(self, internal: FoamData, u, u_jac, u_lap, p_grad):
        source = _u_source(u, self.d, self.f, self.nu)
        convection = jnp.einsum("...ij,...j->...i", u_jac, u)
        viscosity = self.nu * jnp.sum(u_lap, axis=-1)
        return (convection - viscosity + p_grad
                + source * internal["cellToRegion"] - internal["f"])

    def __call__(self, internal, u, u_jac, u_lap, p_grad):
        r = self.residual(internal, u, u_jac, u_lap, p_grad)
        return vector_loss(r, jnp.zeros_like(r))

    def tree_flatten(self):
        return (), (self.nu, self.d, self.f)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MomentumLossFixed:
    """Standardized-coordinate residual with fixed scalar d/f
    (``losses.py:228-270``). Chain-rule factors: convection scales by
    u_std/points_std, viscosity by u_std/points_std^2, pressure by
    p_std/points_std."""
    nu: float
    d: float
    f: float
    u_scaler: StandardScaler
    points_scaler: StandardScaler
    p_scaler: StandardScaler

    def residual(self, internal: FoamData, u, u_jac, u_lap, p_grad):
        u_raw = self.u_scaler.inverse_transform(u)
        source = _u_source(u_raw, self.d, self.f, self.nu)
        convection = jnp.einsum(
            "...ij,...j->...i", u_jac, u_raw / self.points_scaler.std) * self.u_scaler.std
        viscosity = self.nu * jnp.einsum(
            "...ij,...j->...i", u_lap, 1.0 / self.points_scaler.std ** 2) * self.u_scaler.std
        pressure = (self.p_scaler.std / self.points_scaler.std) * p_grad
        return convection - viscosity + pressure + source * internal["cellToRegion"]

    def __call__(self, internal, u, u_jac, u_lap, p_grad):
        r = self.residual(internal, u, u_jac, u_lap, p_grad)
        return vector_loss(r, jnp.zeros_like(r))

    def tree_flatten(self):
        return (self.u_scaler, self.points_scaler, self.p_scaler), (self.nu, self.d, self.f)

    @classmethod
    def tree_unflatten(cls, aux, children):
        nu, d, f = aux
        return cls(nu, d, f, *children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MomentumLossVariable:
    """Standardized-coordinate residual with per-point d/f coefficient fields
    denormalized through their scalers (``losses.py:273-319``)."""
    nu: float
    u_scaler: StandardScaler
    points_scaler: StandardScaler
    p_scaler: StandardScaler
    d_scaler: Normalizer
    f_scaler: Normalizer

    def residual(self, internal: FoamData, u, u_jac, u_lap, p_grad):
        u_raw = self.u_scaler.inverse_transform(u)
        d_raw = self.d_scaler.inverse_transform(internal["d"])
        f_raw = self.f_scaler.inverse_transform(internal["f"])
        source = _u_source(u_raw, d_raw, f_raw, self.nu)
        convection = jnp.einsum(
            "...ij,...j->...i", u_jac, u_raw / self.points_scaler.std) * self.u_scaler.std
        viscosity = self.nu * jnp.einsum(
            "...ij,...j->...i", u_lap, 1.0 / self.points_scaler.std ** 2) * self.u_scaler.std
        pressure = (self.p_scaler.std / self.points_scaler.std) * p_grad
        return convection - viscosity + pressure + source * internal["cellToRegion"]

    def __call__(self, internal, u, u_jac, u_lap, p_grad):
        r = self.residual(internal, u, u_jac, u_lap, p_grad)
        return vector_loss(r, jnp.zeros_like(r))

    def tree_flatten(self):
        return (self.u_scaler, self.points_scaler, self.p_scaler,
                self.d_scaler, self.f_scaler), (self.nu,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], *children)
