"""duct_fixed_boundary training (reference examples/duct_fixed_boundary/
train.py): 2D duct with a porous obstacle, fixed inlet BC and porosity
coefficients; PIPN family with data + physics losses."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import flax.linen as nn
import numpy as np

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.models.pipn import (pipn_foam, pipn_foam_pp,
                                        pipn_foam_pp_full, pipn_foam_pp_mrg)
from porous_cfd_tpu.physics.scaling import FixedLossScaler, RelobraloScaler
from porous_cfd_tpu.pipelines.training import build_arg_parser, train

NU, D, F = 1489.4e-6, 14000.0, 17.11
N_DIM = 2
N_BOUNDARY_IDS = 4


def get_loss_scaler(args):
    """Reference (duct_fixed_boundary/train.py:10-17): obs weight 100."""
    if args.loss_scaler == "relobralo":
        return RelobraloScaler(9, alpha=1 - 0.995)
    return FixedLossScaler.from_dict({"continuity": [1],
                                      "momentum": [1] * 2,
                                      "boundary": [1] * 3,
                                      "observations": [100] * 3})


def get_model(args, normalizers):
    """Reference zoo (duct_fixed_boundary/train.py:20-80)."""
    n_dim, n_bid = N_DIM, N_BOUNDARY_IDS
    match args.model:
        case "pipn":
            return pipn_foam(
                nu=NU, d=D, f=F,
                fe_local_layers=[n_dim, 64, 64],
                fe_global_layers=[64 + 1 + n_bid, 96, 128, 1024],
                seg_layers=[1024 + 64, 512, 256, 128, 3],
                seg_dropout=[0.05, 0.05, 0, 0],
                scalers=normalizers,
                activation=nn.silu,
                fast_derivatives=not getattr(args, "exact_derivatives",
                                             False),
                coupled_context=getattr(args, "coupled_context", False))
        case "pipn-pp":
            return pipn_foam_pp(
                nu=NU, d=D, f=F,
                fe_local_layers=[n_dim, 64, 64],
                seg_layers=[1024 + 64, 378, 128, 3],
                seg_dropout=[0.05, 0, 0],
                fe_radius=[0.5, 1],
                fe_fraction=[0.5, 0.25],
                fe_global_layers=[[n_dim + n_bid + 2, 64, 64],
                                  [64 + n_dim, 128, 128],
                                  [128 + n_dim, 256, 1024]],
                scalers=normalizers,
                activation=nn.silu)
        case "pipn-pp-mrg":
            return pipn_foam_pp_mrg(
                n_dims=n_dim, mrg_in_features=n_bid + n_dim,
                nu=NU, d=D, f=F,
                fe_local_layers=[n_dim, 64, 64],
                seg_layers=[1024 + 64, 384, 128, 3],
                seg_dropout=[0.05, 0, 0],
                scalers=normalizers,
                activation=nn.silu)
        case "pipn-pp-full":
            return pipn_foam_pp_full(
                nu=NU, d=D, f=F,
                enc_layers=[[n_dim * 2 + 1 + n_bid, 64, 64, 128],
                            [128 + n_dim, 128, 128, 256],
                            [256 + n_dim, 1024]],
                enc_radius=[0.4, 0.8],
                enc_fraction=[0.5, 0.25],
                dec_layers=[[1024 + 256, 256, 256],
                            [128 + 256, 128, 128],
                            [128 + n_bid + n_dim + 1, 128, 128, 128, 3]],
                dec_k=[3, 3, 3],
                dec_dropout=[0.0, 0.0, [0.15, 0.15, 0.0, 0.0]],
                scalers=normalizers,
                activation=nn.silu)
        case _:
            raise NotImplementedError(args.model)


def make_datasets(args, dataset_cls=FoamDataset):
    rng = np.random.default_rng(8421)
    train_data = dataset_cls(args.train_dir, args.n_internal, args.n_boundary,
                             args.n_observations, rng=rng)
    val_data = dataset_cls(args.val_dir, args.n_internal, args.n_boundary,
                           args.n_observations, rng=rng,
                           meta_dir=args.train_dir)
    return train_data, val_data


def run():
    args = build_arg_parser().parse_args()
    train_data, val_data = make_datasets(args)
    model = get_model(args, train_data.normalizers)
    train(args, model, train_data, val_data, get_loss_scaler(args))


if __name__ == "__main__":
    run()
