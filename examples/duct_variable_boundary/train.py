"""duct_variable_boundary training (reference
examples/duct_variable_boundary/train.py): variable inlet velocity/angle and
per-case Darcy-Forchheimer coefficients; PI-GANO family."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.models.pi_gano import pi_gano, pi_gano_pp, pi_gano_pp_full
from porous_cfd_tpu.physics.scaling import FixedLossScaler, RelobraloScaler
from porous_cfd_tpu.pipelines.training import build_arg_parser, train

NU = 1489.4e-6
VARIABLE_BOUNDARIES = {"Subdomains": ["inlet", "internal"],
                       "Features": ["U-inlet", "d", "f"]}
N_DIM = 2
N_BOUNDARY_ID = 4


def get_loss_scaler(args):
    if args.loss_scaler == "relobralo":
        return RelobraloScaler(9, alpha=1 - 0.995)
    return FixedLossScaler.from_dict({"continuity": [1],
                                      "momentum": [1] * 2,
                                      "boundary": [1] * 3,
                                      "observations": [100] * 3})


def get_model(args, normalizers):
    """Reference zoo (duct_variable_boundary/train.py:21-83)."""
    n_dim, n_bid = N_DIM, N_BOUNDARY_ID
    match args.model:
        case "pi-gano":
            return pi_gano(nu=NU, out_features=3,
                           branch_layers=[8, 128, 352, 352, 352],
                           geometry_layers=[n_dim + n_bid + 1, 64, 176, 176, 176],
                           local_layers=[n_dim, 64, 176, 176, 176],
                           n_operators=4,
                           operator_dropout=[0, 0.1, 0.1, 0],
                           scalers=normalizers,
                           variable_boundaries=VARIABLE_BOUNDARIES,
                           fast_derivatives=True)
        case "pi-gano-full":
            return pi_gano(nu=NU, out_features=3,
                           branch_layers=[8, 128, 352, 352, 352],
                           geometry_layers=[n_dim + n_bid + 1, 64, 176, 176, 176],
                           local_layers=[n_dim, 64, 176, 176, 176],
                           n_operators=4,
                           operator_dropout=[0, 0.1, 0.1, 0],
                           scalers=normalizers,
                           variable_boundaries=VARIABLE_BOUNDARIES,
                           full=True, fast_derivatives=True)
        case "pi-gano-pp":
            return pi_gano_pp(nu=NU, out_features=3,
                              branch_layers=[8, 128, 352, 352, 352],
                              geometry_layers=[[n_dim * 2 + n_bid, 64, 64],
                                               [64 + n_dim, 176, 176],
                                               [176 + n_dim, 176, 176]],
                              geometry_radius=[0.5, 1],
                              geometry_fraction=[0.5, 0.25],
                              local_layers=[n_dim, 64, 176, 176, 176],
                              n_operators=4,
                              operator_dropout=[0, 0.1, 0.1, 0],
                              scalers=normalizers,
                              variable_boundaries=VARIABLE_BOUNDARIES,
                              max_neighbors=32)
        case "pi-gano-pp-full":
            return pi_gano_pp_full(nu=NU, out_features=3,
                                   branch_layers=[8, 128, 256, 256, 256],
                                   enc_layers=[[n_dim * 2 + n_bid + 1, 64, 64, 128],
                                               [128 + n_dim, 128, 128, 256],
                                               [256 + n_dim, 512]],
                                   enc_radius=[0.5, 1],
                                   enc_fraction=[0.5, 0.25],
                                   dec_layers=[[512 + 256, 256, 256],
                                               [128 + 256, 128, 128],
                                               [128 + n_dim + n_bid + 1,
                                                128, 128, 128, 3]],
                                   dec_k=[3, 3, 3],
                                   fp_dropout=[0.0, 0.0, [0.0, 0.2, 0.2, 0.0]],
                                   scalers=normalizers,
                                   variable_boundaries=VARIABLE_BOUNDARIES)
        case _:
            raise NotImplementedError(args.model)


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    train_data = FoamDataset(args.train_dir, args.n_internal, args.n_boundary,
                             args.n_observations, rng=rng)
    val_data = FoamDataset(args.val_dir, args.n_internal, args.n_boundary,
                           args.n_observations, rng=rng,
                           meta_dir=args.train_dir)
    model = get_model(args, train_data.normalizers)
    train(args, model, train_data, val_data, get_loss_scaler(args))


if __name__ == "__main__":
    run()
