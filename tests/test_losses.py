"""Physics-residual verification against the manufactured solution — the
reference's built-in verification mechanism (SURVEY.md section 4.1), here as
real unit tests."""
import jax.numpy as jnp
import numpy as np

from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.data.manufactured import (MANUFACTURED_LABELS,
                                              make_manufactured_batch,
                                              manufactured_fields)
from porous_cfd_tpu.data.scalers import Normalizer, StandardScaler
from porous_cfd_tpu.physics.losses import (ContinuityLoss,
                                           ContinuityLossStandardized,
                                           MomentumLossFixed,
                                           MomentumLossManufactured,
                                           MomentumLossVariable, vector_loss)
from porous_cfd_tpu.physics.operators import pinn_derivatives, split_derivatives

NU, D, F = 0.01, 50.0, 1.0


def analytic_apply(pts):
    x, y = pts[..., 0], pts[..., 1]
    ux = jnp.sin(y) * jnp.cos(x)
    uy = -jnp.sin(x) * jnp.cos(y)
    p = -0.25 * (jnp.cos(2 * x) + jnp.cos(2 * y))
    return jnp.stack([ux, uy, p], axis=-1)


def make_internal(batch_size=2, n=64, seed=0):
    rng = np.random.default_rng(seed)
    batch = make_manufactured_batch(rng, batch_size, n, 16, NU, D, F)
    return batch["internal"]


def test_manufactured_momentum_residual_vanishes():
    internal = make_internal()
    pts = internal["C"]
    out, jac, lap = pinn_derivatives(analytic_apply, pts)
    u_jac, u_lap, p_grad = split_derivatives(jac, lap, dims=2)
    loss = MomentumLossManufactured(NU, D, F)
    res = loss.residual(internal, out[..., :2], u_jac, u_lap, p_grad)
    # exact solution + exact forcing => residual ~ 0 (float32 derivative noise)
    assert float(jnp.max(jnp.abs(res))) < 5e-4


def test_manufactured_continuity_vanishes():
    internal = make_internal(seed=1)
    out, jac, lap = pinn_derivatives(analytic_apply, internal["C"])
    u_jac, _, _ = split_derivatives(jac, lap, dims=2)
    res = ContinuityLoss().residual(u_jac)
    assert float(jnp.max(jnp.abs(res))) < 5e-5


def test_vector_loss_shape_and_value():
    x = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]]])
    y = jnp.zeros_like(x)
    v = vector_loss(x, y)
    np.testing.assert_allclose(v, [(1 + 9) / 2, (4 + 16) / 2])


def _standardized_setup(seed=3):
    """Build scalers and a standardized-space network equivalent to the raw
    analytic solution, to verify standardization chain rules."""
    rng = np.random.default_rng(seed)
    c_scaler = StandardScaler(jnp.asarray([2.1, 1.3]), jnp.asarray([3.0, 2.9]))
    u_scaler = StandardScaler(jnp.asarray([0.7, 1.8]), jnp.asarray([0.1, -0.2]))
    p_scaler = StandardScaler(jnp.asarray([1.4]), jnp.asarray([0.3]))

    def std_apply(pts_std):
        """Network operating in standardized coordinates/outputs."""
        pts_raw = c_scaler.inverse_transform(pts_std)
        out_raw = analytic_apply(pts_raw)
        u_std = u_scaler.transform(out_raw[..., :2])
        p_std = p_scaler.transform(out_raw[..., 2:])
        return jnp.concatenate([u_std, p_std], axis=-1)

    pts_raw = jnp.asarray(rng.uniform(0.5, 5.0, size=(2, 32, 2)), jnp.float32)
    return c_scaler, u_scaler, p_scaler, std_apply, pts_raw


def test_standardized_continuity_chain_rule():
    c_s, u_s, p_s, std_apply, pts_raw = _standardized_setup()
    out, jac, lap = pinn_derivatives(std_apply, c_s.transform(pts_raw))
    u_jac, _, _ = split_derivatives(jac, lap, dims=2)
    res_std = ContinuityLossStandardized(u_s, c_s).residual(u_jac)

    out_r, jac_r, lap_r = pinn_derivatives(analytic_apply, pts_raw)
    u_jac_r, _, _ = split_derivatives(jac_r, lap_r, dims=2)
    res_raw = ContinuityLoss().residual(u_jac_r)
    np.testing.assert_allclose(res_std, res_raw, atol=2e-4)


def test_momentum_fixed_equals_raw_residual():
    """MomentumLossFixed on a standardized net must equal the raw-space
    NS-Darcy residual terms (losses.py:256-266 chain rule)."""
    c_s, u_s, p_s, std_apply, pts_raw = _standardized_setup(seed=4)
    zones = (pts_raw[..., 0:1] > 2.5).astype(jnp.float32)
    labels = {"Cx": None, "Cy": None, "cellToRegion": None, "C": ["Cx", "Cy"]}
    data = jnp.concatenate([pts_raw, zones], axis=-1)
    internal = FoamData(data, labels, {"internal": jnp.broadcast_to(
        jnp.arange(pts_raw.shape[1]), pts_raw.shape[:2])})

    out, jac, lap = pinn_derivatives(std_apply, c_s.transform(pts_raw))
    u_jac, u_lap, p_grad = split_derivatives(jac, lap, dims=2)
    res_std = MomentumLossFixed(NU, D, F, u_s, c_s, p_s).residual(
        internal, out[..., :2], u_jac, u_lap, p_grad)

    # raw-space residual (manufactured loss without forcing subtraction)
    out_r, jac_r, lap_r = pinn_derivatives(analytic_apply, pts_raw)
    u_jac_r, u_lap_r, p_grad_r = split_derivatives(jac_r, lap_r, dims=2)
    u_raw = out_r[..., :2]
    u_mag = jnp.linalg.norm(u_raw, axis=-1, keepdims=True)
    source = u_raw * (D * NU + 0.5 * u_mag * F)
    res_raw = (jnp.einsum("...ij,...j->...i", u_jac_r, u_raw)
               - NU * jnp.sum(u_lap_r, axis=-1) + p_grad_r + source * zones)
    np.testing.assert_allclose(res_std, res_raw, atol=5e-3)


def test_momentum_variable_matches_fixed_for_constant_coeffs():
    """With constant per-point d/f fields the variable loss equals the fixed."""
    c_s, u_s, p_s, std_apply, pts_raw = _standardized_setup(seed=5)
    zones = (pts_raw[..., 0:1] > 2.5).astype(jnp.float32)
    d_scaler = Normalizer(jnp.asarray([0.0]), jnp.asarray([100.0]))
    f_scaler = Normalizer(jnp.asarray([0.0]), jnp.asarray([4.0]))
    d_norm = jnp.full_like(zones, D / 100.0)
    f_norm = jnp.full_like(zones, F / 4.0)
    labels = {"Cx": None, "Cy": None, "cellToRegion": None, "d": None,
              "f": None, "C": ["Cx", "Cy"]}
    data = jnp.concatenate([pts_raw, zones, d_norm, f_norm], axis=-1)
    internal = FoamData(data, labels, {"internal": jnp.broadcast_to(
        jnp.arange(pts_raw.shape[1]), pts_raw.shape[:2])})

    out, jac, lap = pinn_derivatives(std_apply, c_s.transform(pts_raw))
    u_jac, u_lap, p_grad = split_derivatives(jac, lap, dims=2)
    args = (internal, out[..., :2], u_jac, u_lap, p_grad)
    res_var = MomentumLossVariable(NU, u_s, c_s, p_s, d_scaler, f_scaler).residual(*args)
    res_fix = MomentumLossFixed(NU, D, F, u_s, c_s, p_s).residual(*args)
    np.testing.assert_allclose(res_var, res_fix, atol=1e-4)


def test_manufactured_fields_consistency():
    """The batch fabric's stored U/p/f columns must equal the analytic fields."""
    rng = np.random.default_rng(7)
    batch = make_manufactured_batch(rng, 1, 32, 16, NU, D, F)
    pts = np.asarray(batch["C"])
    zones = np.asarray(batch["cellToRegion"])
    u, p, f = manufactured_fields(pts, zones, NU, D, F)
    np.testing.assert_allclose(batch["U"], u, atol=1e-6)
    np.testing.assert_allclose(batch["p"], p, atol=1e-6)
    np.testing.assert_allclose(batch["f"], f, atol=1e-6)
    assert set(dict(batch.labels)) == set(MANUFACTURED_LABELS)
