"""Jit-compiled training/validation/prediction step functions.

TPU-native replacement for the Lightning loop around
``PorousPinnBase.training_step`` (``models/model_base.py:182-226``). Key
differences from the torch reference, by design:

  * the whole epoch runs as ONE device program (``lax.scan`` over shuffled
    batch indices gathered from the device-resident dataset), so step dispatch
    overhead vanishes;
  * the D + D^2 + 1 autograd graph replays become one fused
    vjp + forward-over-reverse pass (see ``porous_cfd_tpu.physics.operators``);
  * loss balancing state (ReLoBRaLo) is carried explicitly in ``TrainState``;
  * batches are sharded over a ``jax.sharding.Mesh`` ('data' axis for the
    geometry batch, optional 'points' axis for the point dimension); gradient
    all-reduce is XLA's own psum insertion.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.physics.losses import mae, mse, vector_loss
from porous_cfd_tpu.physics.operators import pinn_derivatives, split_derivatives
from porous_cfd_tpu.physics.scaling import LossScaler


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    scaler_state: Any = None


def make_optimizer(model: PinnModel, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + per-epoch exponential LR decay (every reference model's
    ``configure_optimizers``, e.g. pipn_foam.py:102-105)."""
    schedule = optax.exponential_decay(
        init_value=model.learning_rate,
        transition_steps=max(1, steps_per_epoch),
        decay_rate=model.lr_gamma,
        staircase=True)
    return optax.adam(learning_rate=schedule, eps=model.adam_eps)


def gather_cases(dataset: FoamData, idxs: jnp.ndarray) -> FoamData:
    """Select a batch of cases from the stacked (C, N, D) device dataset."""
    return FoamData(dataset.data[idxs], dataset.labels,
                    {k: v[idxs] for k, v in dataset.domain.items()})


def shard_batch(batch: FoamData, mesh=None, shard_points: bool = False) -> FoamData:
    """Annotate batch sharding: geometry batch over 'data', optionally the
    point axis over 'points'. XLA inserts the collectives (all-reduce for the
    global max-pool and gradient psum) automatically."""
    if mesh is None:
        return batch
    axes = ("data", "points" if shard_points else None, None)
    data = jax.lax.with_sharding_constraint(
        batch.data, NamedSharding(mesh, P(*axes)))
    # partial spec: batch axis sharded, remaining axes (any rank — neighbor
    # caches are (B, C, K)) replicated
    dom = {k: jax.lax.with_sharding_constraint(v, NamedSharding(mesh, P("data")))
           for k, v in batch.domain.items()}
    return FoamData(data, batch.labels, dom)


def _forward(model: PinnModel, params, points, batch, rng=None,
             deterministic=True, module=None):
    rngs = None if rng is None else {"dropout": rng}
    module = model.module if module is None else module
    return module.apply({"params": params}, points, batch,
                        deterministic=deterministic, rngs=rngs)


from porous_cfd_tpu.data.foam_data import split_contiguous  # noqa: E402


def compute_losses(model: PinnModel, params, batch: FoamData, rng,
                   deterministic: bool = False):
    """The reference ``training_step`` body (model_base.py:182-212): forward on
    [internal||boundary] points, boundary MSE, fused derivatives, continuity +
    momentum residuals, optional observation MSE. Returns the unscaled loss
    vector [continuity, momentum.., boundary_u.., boundary_p, obs_u.., obs_p]
    and the full-domain predictions."""
    internal, boundary = split_contiguous(batch)
    n_int = internal.data.shape[-2]

    if model.derivative_apply is not None:
        out, jac, lap = model.derivative_apply(params, batch, rng,
                                               deterministic)
    else:
        boundary_pts = boundary["C"]

        def apply_fn(pts):
            all_pts = jnp.concatenate([pts, boundary_pts], axis=-2)
            return _forward(model, params, all_pts, batch, rng, deterministic)

        if model.remat:
            apply_fn = jax.checkpoint(apply_fn)
        out, jac, lap = pinn_derivatives(apply_fn, internal["C"])
    predicted = FoamData(out, model.predicted_labels, batch.domain)
    pred_internal = FoamData(out[..., :n_int, :], model.predicted_labels,
                             {"internal": internal.domain["internal"]})
    pred_boundary = FoamData(out[..., n_int:, :], model.predicted_labels,
                             {"boundary": boundary.domain["boundary"]})

    boundary_p_loss = mse(pred_boundary["p"], boundary["p"])
    boundary_u_loss = vector_loss(pred_boundary["U"], boundary["U"])

    u_jac, u_lap, p_grad = split_derivatives(jac, lap, model.dims)
    continuity = model.continuity_loss(u_jac)
    momentum = model.momentum_loss(internal, pred_internal["U"], u_jac, u_lap,
                                   p_grad)

    losses = [continuity[None], momentum, boundary_u_loss, boundary_p_loss[None]]
    if model.enable_data_loss:
        # observation rows are a random subset of the internal rows — the one
        # genuinely dynamic selection. Expressed as ONE one-hot matmul over
        # [predictions || targets]: the transpose (w.r.t. the predictions) is
        # a matmul too, and the target rows ride along in the same pass —
        # both take_along_axis' forward gather and its scatter-add transpose
        # serialize on TPU (the row gather alone was 28% of the train step).
        obs_ids = batch.domain["obs"]
        one_hot = jax.nn.one_hot(obs_ids, n_int, dtype=out.dtype)
        tgt = jnp.concatenate([internal["U"], internal["p"]], axis=-1)
        proj = jnp.einsum(
            "...kn,...nf->...kf", one_hot,
            jnp.concatenate([out[..., :n_int, :],
                             jax.lax.stop_gradient(tgt)], axis=-1))
        n_pred = out.shape[-1]
        pred_obs = FoamData(proj[..., :n_pred], model.predicted_labels,
                            {"obs": jnp.arange(obs_ids.shape[-1])})
        obs_u = proj[..., n_pred:n_pred + model.dims]
        obs_p = proj[..., n_pred + model.dims:n_pred + model.dims + 1]
        obs_u_loss = vector_loss(pred_obs["U"], obs_u)
        obs_p_loss = mse(pred_obs["p"], obs_p)
        losses += [obs_u_loss, obs_p_loss[None]]
    return jnp.concatenate(losses), predicted


def compute_errors(model: PinnModel, predicted: FoamData, target: FoamData):
    """Full-domain denormalized MAEs (model_base.py:168-180).
    :return: (u_error (D,), p_error scalar)."""
    pu, pp = model.postprocess_out(predicted["U"], predicted["p"])
    tu, tp = model.postprocess_out(target["U"], target["p"])
    return vector_loss(pu, tu, "mae"), mae(pp, tp)


@dataclasses.dataclass(frozen=True)
class TrainFunctions:
    """Bundle of jitted functions; metric vector layout is
    [total, *losses, p_error, *u_errors]. ``init_state`` is bound to the same
    loss scaler as the step functions (so their carried states always agree)."""
    train_step: Callable
    train_epoch: Callable
    train_epochs: Callable
    eval_batch: Callable
    predict_batch: Callable
    metric_labels: tuple[str, ...]
    init_state: Callable


def make_train_functions(model: PinnModel,
                         tx: optax.GradientTransformation,
                         loss_scaler: Optional[LossScaler] = None,
                         mesh=None,
                         shard_points: bool = False) -> TrainFunctions:
    loss_scaler = loss_scaler or LossScaler()

    def loss_fn(params, batch, rng, scaler_rng, step, scaler_state):
        losses, predicted = compute_losses(model, params, batch, rng,
                                           deterministic=False)
        raw = jax.lax.stop_gradient(losses)
        weights, new_scaler_state = loss_scaler(scaler_state, raw, step,
                                                scaler_rng)
        total = jnp.sum(weights * losses)
        u_err, p_err = compute_errors(model, predicted, batch)
        scaled = weights * raw
        metrics = jnp.concatenate([total[None], scaled, p_err[None], u_err])
        return total, (metrics, new_scaler_state, raw)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _accumulated_grads(state, batch, rng):
        """Micro-batch gradient accumulation: scan over case groups so only
        one micro-batch's (second-order) graph is live at a time — the memory
        profile of the torch reference's sequential autograd replays.

        Loss-scaler semantics match the single-batch path: every micro-batch
        computes its weights from the FROZEN step-start scaler state (one
        shared scaler rng, so ReLoBRaLo's Bernoulli draw is identical across
        micro-batches), and the state advances ONCE per optimizer step using
        the micro-mean raw losses — the same cadence as an unaccumulated
        batch (per-component losses are case means, so the micro-mean equals
        the full-batch loss vector for equal groups)."""
        b = batch.data.shape[0]
        # largest micro-batch size <= model.microbatch that divides B exactly
        # (never drop cases; B=13 with microbatch=2 degrades to 1)
        m = next(m for m in range(min(model.microbatch, b), 0, -1)
                 if b % m == 0)
        groups = b // m
        scaler_rng = jax.random.fold_in(rng, 1)
        leaves = (batch.data, tuple(batch.domain.values()))
        keys = tuple(batch.domain.keys())
        grouped = jax.tree_util.tree_map(
            lambda x: x[:groups * m].reshape(groups, m, *x.shape[1:]), leaves)

        def body(carry, mb_leaves):
            g_acc, m_acc, l_acc, i = carry
            data, dom_vals = mb_leaves
            mb = FoamData(data, batch.labels, dict(zip(keys, dom_vals)))
            (_, (metrics, _, raw)), grads = grad_fn(
                state.params, mb, jax.random.fold_in(rng, i), scaler_rng,
                state.step, state.scaler_state)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            return (g_acc, m_acc + metrics, l_acc + raw, i + 1), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zero_m = jnp.zeros((1 + model.num_losses + 1 + model.dims,),
                           jnp.float32)
        zero_l = jnp.zeros((model.num_losses,), jnp.float32)
        (grads, metrics, raw_sum, _), _ = jax.lax.scan(
            body, (zero_g, zero_m, zero_l, 0), grouped)
        grads = jax.tree_util.tree_map(lambda g: g / groups, grads)
        _, scaler_state = loss_scaler(state.scaler_state, raw_sum / groups,
                                      state.step, scaler_rng)
        return grads, metrics / groups, scaler_state

    def train_step(state: TrainState, batch: FoamData):
        batch = shard_batch(batch, mesh, shard_points)
        rng = jax.random.fold_in(state.rng, state.step)
        if model.microbatch and model.microbatch < batch.data.shape[0]:
            grads, metrics, scaler_state = _accumulated_grads(state, batch, rng)
        else:
            (_, (metrics, scaler_state, _)), grads = grad_fn(
                state.params, batch, rng, jax.random.fold_in(rng, 1),
                state.step, state.scaler_state)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state, state.rng,
                          scaler_state), metrics

    def train_epoch(state: TrainState, dataset: FoamData, perm: jnp.ndarray):
        """One epoch as a single device program. perm: (S, B) case indices."""
        def body(st, idxs):
            return train_step(st, gather_cases(dataset, idxs))
        state, metrics = jax.lax.scan(body, state, perm)
        return state, jnp.mean(metrics, axis=0)

    def train_epochs(state: TrainState, dataset: FoamData, perms: jnp.ndarray):
        """K epochs as ONE device program (scan over epochs of the epoch
        scan). perms: (K, S, B). Returns per-epoch mean metrics (K, M) so the
        host can still log every epoch's scalars — it just syncs once per
        chunk instead of once per epoch (the per-epoch device->host round
        trip dominates wall clock on high-latency backends)."""
        def body(st, perm):
            return train_epoch(st, dataset, perm)
        return jax.lax.scan(body, state, perms)

    def eval_batch(params, batch: FoamData):
        """Validation step (model_base.py:220-226): plain forward on all points,
        denormalized MAEs. Returns [p_error, *u_errors]. Forward-only, so the
        mixed-precision eval module applies (errors reduced in f32)."""
        batch = shard_batch(batch, mesh, shard_points)
        out = _forward(model, params, batch["C"], batch, deterministic=True,
                       module=model.eval_module).astype(jnp.float32)
        predicted = FoamData(out, model.predicted_labels, batch.domain)
        u_err, p_err = compute_errors(model, predicted, batch)
        return jnp.concatenate([p_err[None], u_err])

    def predict_batch(params, batch: FoamData, verbose: bool = False):
        """Prediction (model_base.py:228-254). With ``verbose`` also returns the
        residual fields as a second FoamData (channels [Momentum.., div])."""
        if not verbose:
            out = _forward(model, params, batch["C"], batch, deterministic=True,
                           module=model.eval_module).astype(jnp.float32)
            return FoamData(out, model.predicted_labels, batch.domain)
        internal = batch["internal"]
        if model.derivative_apply is not None:
            out, jac, lap = model.derivative_apply(params, batch, None, True)
        else:
            boundary_pts = batch["boundary"]["C"]

            def apply_fn(pts):
                all_pts = jnp.concatenate([pts, boundary_pts], axis=-2)
                return _forward(model, params, all_pts, batch,
                                deterministic=True)

            if model.remat:
                apply_fn = jax.checkpoint(apply_fn)
            out, jac, lap = pinn_derivatives(apply_fn, internal["C"])
        predicted = FoamData(out, model.predicted_labels, batch.domain)
        u_jac, u_lap, p_grad = split_derivatives(jac, lap, model.dims)
        div = model.continuity_loss.residual(u_jac)
        momentum = model.momentum_loss.residual(
            internal, predicted["internal"]["U"], u_jac, u_lap, p_grad)
        residuals = jnp.concatenate([momentum, div[..., None]], axis=-1)
        extras = FoamData(residuals, model.extra_labels,
                          {"internal": batch.domain["internal"]})
        return predicted, extras

    from porous_cfd_tpu.models.base import error_labels, loss_labels
    labels = (["Total loss"] + loss_labels(model.dims, model.enable_data_loss)
              + [f"Train {l}" for l in error_labels(model.dims)])

    def init_state(sample_batch: FoamData, seed: int = 8421) -> TrainState:
        return init_train_state(model, tx, sample_batch, seed, loss_scaler)

    return TrainFunctions(
        train_step=jax.jit(train_step, donate_argnums=0),
        train_epoch=jax.jit(train_epoch, donate_argnums=0),
        train_epochs=jax.jit(train_epochs, donate_argnums=0),
        eval_batch=jax.jit(eval_batch),
        predict_batch=jax.jit(predict_batch, static_argnums=2),
        metric_labels=tuple(labels),
        init_state=init_state)


def init_train_state(model: PinnModel,
                     tx: optax.GradientTransformation,
                     sample_batch: FoamData,
                     seed: int = 8421,
                     loss_scaler: Optional[LossScaler] = None) -> TrainState:
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    pts = jnp.concatenate(
        [sample_batch["internal"]["C"], sample_batch["boundary"]["C"]], axis=-2)
    variables = model.module.init(
        {"params": init_rng, "dropout": init_rng}, pts, sample_batch,
        deterministic=True)
    params = variables["params"]
    scaler_state = (loss_scaler or LossScaler()).init_state()
    return TrainState(jnp.asarray(0, jnp.int32), params, tx.init(params),
                      state_rng, scaler_state)
