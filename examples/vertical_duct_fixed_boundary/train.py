"""vertical_duct_fixed_boundary training (reference
examples/vertical_duct_fixed_boundary/train.py): adds a second top inlet and
FINE-TUNES from a duct_fixed_boundary checkpoint (--checkpoint is required,
train.py:96)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.duct_fixed_boundary.train import get_loss_scaler, get_model
from examples.vertical_duct_fixed_boundary.vertical_duct_dataset import \
    VerticalDuctDataset
from porous_cfd_tpu.pipelines.training import build_arg_parser, train

import numpy as np


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    train_data = VerticalDuctDataset(args.train_dir, args.n_internal,
                                     args.n_boundary, args.n_observations,
                                     rng=rng)
    val_data = VerticalDuctDataset(args.val_dir, args.n_internal,
                                   args.n_boundary, args.n_observations,
                                   rng=rng, meta_dir=args.train_dir)
    model = get_model(args, train_data.normalizers)
    # fine-tune: --checkpoint restores params before continuing training
    train(args, model, train_data, val_data, get_loss_scaler(args))


if __name__ == "__main__":
    run()
