"""abc training (reference examples/abc/train.py): 3D CAD objects (ABC
dataset) aligned into a cylindrical duct; PIPN family, variable inlet speed in
the data but fixed-coefficient physics."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.models.pipn import (pipn_foam, pipn_foam_pp,
                                        pipn_foam_pp_full, pipn_foam_pp_mrg)
from porous_cfd_tpu.physics.scaling import FixedLossScaler, RelobraloScaler
from porous_cfd_tpu.pipelines.training import build_arg_parser, train

NU, D, F = 1489.4e-6, 30000.0, 79.731
N_DIMS = 3
N_BOUNDARY_IDS = 4


def get_loss_scaler(args):
    """Reference (abc/train.py:8-16): obs weight 100 over 4 outputs."""
    if args.loss_scaler == "relobralo":
        return RelobraloScaler(12, alpha=1 - 0.995)
    return FixedLossScaler.from_dict({"continuity": [1],
                                      "momentum": [1] * 3,
                                      "boundary": [1] * 4,
                                      "observations": [100] * 4})


def get_model(args, normalizers):
    """Reference zoo (abc/train.py:19-80)."""
    n, b = N_DIMS, N_BOUNDARY_IDS
    match args.model:
        case "pipn":
            return pipn_foam(
                nu=NU, d=D, f=F,
                fe_local_layers=[n, 64, 64],
                fe_global_layers=[64 + b + 1, 96, 128, 1024],
                seg_layers=[1024 + 64, 512, 256, 128, n + 1],
                seg_dropout=[0.03, 0.02, 0, 0],
                scalers=normalizers,
                fast_derivatives=not getattr(args, "exact_derivatives",
                                             False),
                coupled_context=getattr(args, "coupled_context", False))
        case "pipn-pp":
            return pipn_foam_pp(
                nu=NU, d=D, f=F,
                fe_local_layers=[n, 64, 64],
                seg_layers=[1024 + 64, 384, 128, n + 1],
                seg_dropout=[0.03, 0, 0],
                fe_radius=[0.5, 1],
                fe_fraction=[0.5, 0.25],
                fe_global_layers=[[n + b + n, 64, 128],
                                  [128 + n, 128, 256],
                                  [256 + n, 256, 1024]],
                scalers=normalizers,
                max_neighbors=16)
        case "pipn-pp-mrg":
            return pipn_foam_pp_mrg(
                n_dims=n, mrg_in_features=b + n,
                nu=NU, d=D, f=F,
                fe_local_layers=[n, 64, 64],
                seg_layers=[1024 + 64, 384, 128, n + 1],
                seg_dropout=[0.03, 0, 0],
                scalers=normalizers,
                max_neighbors=16)
        case "pipn-pp-full":
            return pipn_foam_pp_full(
                nu=NU, d=D, f=F,
                enc_layers=[[n + b + 1 + n, 64, 64, 128],
                            [128 + n, 128, 128, 256],
                            [256 + n, 1024]],
                enc_radius=[0.4, 0.8],
                enc_fraction=[0.5, 0.25],
                dec_layers=[[1024 + 256, 256, 256],
                            [128 + 256, 128, 128],
                            [128 + n + b + 1, 128, 128, 128, n + 1]],
                dec_k=[3, 3, 3],
                dec_dropout=[0.0, 0.0, [0.0, 0.2, 0.2, 0.0]],
                scalers=normalizers,
                max_neighbors=16)
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
