"""Manufactured-solutions training (reference
examples/manufactured_solutions/train.py): physics-only PIPN / PIPN++ verified
against the analytic NS-Darcy solution. CPU/TPU-runnable without OpenFOAM."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import flax.linen as nn
import numpy as np

from porous_cfd_tpu.data.manufactured import ManufacturedDataset
from porous_cfd_tpu.models.pipn import pipn_manufactured, pipn_manufactured_pp
from porous_cfd_tpu.pipelines.training import build_arg_parser, train

NU, D, F = 0.01, 50.0, 1.0


def get_model(name: str, d: float, f: float):
    """Reference zoo (manufactured_solutions/train.py:9-29)."""
    n_dim = 2
    n_boundary_ids = 2
    if name == "pipn":
        return pipn_manufactured(
            nu=NU, d=d, f=f,
            fe_local_layers=[n_dim, 64, 64],
            fe_global_layers=[64 + n_boundary_ids + 1, 64, 128, 1024],
            seg_layers=[1024 + 64, 512, 256, 128, 3],
            activation=nn.tanh)
    if name == "pipn-pp":
        return pipn_manufactured_pp(
            nu=NU, d=d, f=f,
            fe_local_layers=[n_dim, 64, 64],
            fe_global_layers=[[n_dim * 2 + n_boundary_ids, 64],
                              [64 + n_dim, 128],
                              [128 + n_dim, 1024]],
            fe_global_radius=[0.6, 1.2],
            fe_global_fraction=[0.5, 0.25],
            seg_layers=[1024 + 64, 512, 256, 128, 3],
            activation=nn.tanh)
    raise NotImplementedError(name)


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    train_data = ManufacturedDataset(args.train_dir, args.n_internal,
                                     args.n_boundary, D, F, rng=rng)
    val_data = ManufacturedDataset(args.val_dir, args.n_internal,
                                   args.n_boundary, D, F, rng=rng,
                                   meta_dir=args.train_dir)
    model = get_model(args.model, D, F)
    train(args, model, train_data, val_data)


if __name__ == "__main__":
    run()
