"""windbreaks training (reference examples/windbreaks/train.py): 3D rows of
trees (porous) around a solid house; PI-GANO family with per-species
Darcy-Forchheimer coefficients and variable inlet Ux; physics loss weight 10."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.models.pi_gano import pi_gano, pi_gano_pp, pi_gano_pp_full
from porous_cfd_tpu.physics.scaling import FixedLossScaler, RelobraloScaler
from porous_cfd_tpu.pipelines.training import build_arg_parser, train

NU = 14.61e-6
VARIABLE_BOUNDARIES = {"Subdomains": ["inlet", "internal"],
                       "Features": ["Ux-inlet", "d", "f"]}
N_DIM = 3
N_BOUNDARY_ID = 5


def get_loss_scaler(args):
    """Reference (windbreaks/train.py:11-18): physics x10."""
    if args.loss_scaler == "relobralo":
        return RelobraloScaler(12, alpha=1 - 0.995)
    return FixedLossScaler.from_dict({"continuity": [10],
                                      "momentum": [10] * 3,
                                      "boundary": [1] * 4,
                                      "observations": [1] * 4})


def get_model(args, normalizers):
    """Reference zoo (windbreaks/train.py:21-69)."""
    n, b = N_DIM, N_BOUNDARY_ID
    match args.model:
        case "pi-gano":
            return pi_gano(nu=NU, out_features=n + 1,
                           branch_layers=[10, 256, 256, 512],
                           geometry_layers=[b + n + 1, 256, 256, 256],
                           local_layers=[n, 256, 256, 256],
                           n_operators=4,
                           operator_dropout=[0, 0.15, 0.15, 0],
                           scalers=normalizers,
                           variable_boundaries=VARIABLE_BOUNDARIES,
                           fast_derivatives=True)
        case "pi-gano-pp":
            return pi_gano_pp(nu=NU, out_features=n + 1,
                              branch_layers=[10, 256, 256, 512],
                              geometry_layers=[[n * 2 + b, 64, 128],
                                               [128 + n, 128],
                                               [128 + n, 256, 256]],
                              geometry_radius=[0.5, 1],
                              geometry_fraction=[0.5, 0.25],
                              local_layers=[n, 256, 256, 256],
                              n_operators=4,
                              operator_dropout=[0, 0.15, 0.15, 0],
                              scalers=normalizers,
                              variable_boundaries=VARIABLE_BOUNDARIES)
        case "pi-gano-pp-full":
            return pi_gano_pp_full(nu=NU, out_features=4,
                                   branch_layers=[10, 256, 256, 256],
                                   enc_layers=[[n * 2 + 1 + b, 64, 64, 128],
                                               [128 + n, 128, 128, 256],
                                               [256 + n, 512, 1024]],
                                   enc_radius=[0.5, 1],
                                   enc_fraction=[0.5, 0.25],
                                   dec_layers=[[1024 + 256, 256, 256],
                                               [128 + 256, 128, 128],
                                               [128 + n + 1 + b, 128, 128, 128, 4]],
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
