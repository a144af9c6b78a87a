"""Training pipeline: CLI + orchestration (reference ``common/training.py``).

Same CLI contract (flags, defaults: batch 13, bf16-mixed, 3000 epochs,
checkpoint every 500, loss-scaler 'fixed'), same artifacts
(``lightning_logs/<name>/model_meta.json``, periodic + final checkpoints),
driven by the jitted engine instead of Lightning.
"""
from __future__ import annotations

import argparse
import os
from argparse import ArgumentParser, Namespace

import numpy as np

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.physics.scaling import LossScaler
from porous_cfd_tpu.train.trainer import Trainer, TrainerConfig
from porous_cfd_tpu.utils.cache import enable_persistent_cache


def build_arg_parser() -> ArgumentParser:
    """Reference CLI (training.py:21-47)."""
    p = argparse.ArgumentParser()
    p.add_argument("--n-internal", type=int, default=1000,
                   help="number of internal points to sample")
    p.add_argument("--n-boundary", type=int, default=200,
                   help="number of boundary points to sample")
    p.add_argument("--n-observations", type=int, default=500,
                   help="number of observation points to sample")
    p.add_argument("--batch-size", type=int, default=13)
    p.add_argument("--precision", type=str, default="bf16-mixed",
                   help="model weight precision. Supports mixed precision")
    p.add_argument("--epochs", type=int, default=3000)
    p.add_argument("--logs-dir", type=str, default=os.getcwd(),
                   help="base directory to save model weights")
    p.add_argument("--train-dir", type=str, default="data/train")
    p.add_argument("--val-dir", type=str, default="data/val")
    p.add_argument("--model", type=str,
                   help="model type. The available models depend on the experiment")
    p.add_argument("--name", type=str, default=None,
                   help="experiment name; results saved under this directory")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="checkpoint path to resume/finetune from")
    p.add_argument("--fast-derivatives", action="store_true",
                   help="DEPRECATED no-op: the analytic (v,J,H) derivative "
                        "propagation (physics/analytic.py) is the default "
                        "where the model family supports it; see "
                        "--exact-derivatives to opt out")
    p.add_argument("--exact-derivatives", action="store_true",
                   help="replay the reference's exact nested-autodiff "
                        "semantics instead of the analytic (v,J,H) "
                        "propagation (parity mode, ~18x slower on plain "
                        "PIPN)")
    p.add_argument("--decoupled-context", action="store_true",
                   help="DEPRECATED no-op: the decoupled-context speed mode "
                        "is the plain-PIPN default (accuracy-equivalent at "
                        "reference data scale, CONVERGENCE.md); see "
                        "--coupled-context to opt into max-pool-coupled "
                        "derivatives")
    p.add_argument("--coupled-context", action="store_true",
                   help="with the analytic path on plain PIPN: propagate "
                        "the TRUE max-pool coupling of the pooled global "
                        "feature through the per-point derivatives "
                        "(reference-exactness knob, ~1.5x slower than the "
                        "default decoupled mode)")
    p.add_argument("--loss-scaler", type=str, default="fixed",
                   help="loss scaler. Supports fixed and relobralo")
    p.add_argument("--log-every", type=int, default=1,
                   help="epochs per logging/validation sync; values > 1 also "
                        "run that many epochs as one device program "
                        "(train scalars are still logged per epoch)")
    p.add_argument("--val-every", type=int, default=0,
                   help="epochs between validation passes (and best.ckpt "
                        "selection); 0 = once per --log-every chunk. Set "
                        "below --log-every to keep fine-grained best-"
                        "checkpoint selection with batched device programs")
    p.add_argument("--resample-every", type=int, default=0,
                   help="epochs between fresh point-cloud subsamples of the "
                        "training cases (0 = reference behavior: sample once "
                        "at load). Uses the cached full-resolution parses, "
                        "keeps static shapes (no recompilation), and is "
                        "deterministic in the epoch index (resume-safe)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="devices on the 'data' mesh axis (geometry-batch "
                        "data parallelism; XLA inserts the gradient psum "
                        "over ICI). 0 = single device; -1 = all available "
                        "devices not used by --mesh-points")
    p.add_argument("--mesh-points", type=int, default=1,
                   help="devices on the 'points' mesh axis (point-cloud "
                        "sharding for large 3D clouds; the global max-pool "
                        "lowers to an all-reduce over this axis)")
    return p


def mesh_from_args(args: Namespace):
    """(mesh, shard_points) from the --mesh-data/--mesh-points flags; (None,
    False) when multi-device execution is not requested."""
    data = getattr(args, "mesh_data", 0)
    points = getattr(args, "mesh_points", 1)
    if not data and points <= 1:
        return None, False
    from porous_cfd_tpu.parallel.mesh import make_mesh
    # only -1 auto-fills the data axis; 0 means exactly what the help says
    # ("single device"), so --mesh-points alone builds a (1, P) mesh
    mesh = make_mesh(data=None if data == -1 else max(1, data),
                     points=max(1, points))
    return mesh, points > 1


def train(args: Namespace, model: PinnModel,
          train_data: FoamDataset, val_data: FoamDataset | None,
          loss_scaler: LossScaler | None = None,
          mesh=None, shard_points: bool = False) -> None:
    """Train with checkpoint-every-500-epochs + final model.ckpt
    (training.py:50-85). Multi-device execution comes either from an
    explicit ``mesh`` argument or from the --mesh-data/--mesh-points CLI
    flags (every experiment train.py gets it through here)."""
    enable_persistent_cache()
    if mesh is None:
        mesh, flag_shard_points = mesh_from_args(args)
        shard_points = shard_points or flag_shard_points
    cfg = TrainerConfig(epochs=args.epochs, batch_size=args.batch_size,
                        logs_dir=args.logs_dir, name=args.name,
                        log_every=getattr(args, "log_every", 1),
                        val_every=getattr(args, "val_every", 0),
                        resample_every=getattr(args, "resample_every", 0))

    def resample_fn(round_idx: int):
        train_data.resample(np.random.default_rng(
            (cfg.seed, round_idx)))
        return train_data.stacked()
    # --precision is honored on the forward-only surfaces (validation here,
    # inference via model_meta.json); physics/derivative graphs stay f32
    # (axon bf16 second-order miscompile, BASELINE.md).
    model = model.with_precision(args.precision)
    trainer = Trainer(model,
                      train_data.stacked(),
                      val_data.stacked() if val_data is not None else None,
                      cfg, loss_scaler, mesh, shard_points,
                      model_type=args.model, resample_fn=resample_fn)
    trainer.write_model_meta(args.n_internal, args.n_boundary,
                             args.n_observations, args.precision)
    trainer.fit(resume_from=args.checkpoint)
