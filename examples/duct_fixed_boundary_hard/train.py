"""duct_fixed_boundary_hard training (reference
examples/duct_fixed_boundary_hard/train.py): composed multi-primitive porous
obstacles; same PIPN zoo as duct_fixed_boundary but observation loss weights
[30, 30, 100]."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.duct_fixed_boundary.train import get_model, make_datasets
from porous_cfd_tpu.physics.scaling import FixedLossScaler, RelobraloScaler
from porous_cfd_tpu.pipelines.training import build_arg_parser, train


def get_loss_scaler(args):
    """Reference (duct_fixed_boundary_hard/train.py:10-17)."""
    if args.loss_scaler == "relobralo":
        return RelobraloScaler(9, alpha=1 - 0.995)
    return FixedLossScaler.from_dict({"continuity": [1],
                                      "momentum": [1] * 2,
                                      "boundary": [1] * 3,
                                      "observations": [30, 30, 100]})


def run():
    args = build_arg_parser().parse_args()
    train_data, val_data = make_datasets(args)
    model = get_model(args, train_data.normalizers)
    train(args, model, train_data, val_data, get_loss_scaler(args))


if __name__ == "__main__":
    run()
