"""Two-checkpoint statistical comparison for the manufactured-solutions
experiment (reference examples/manufactured_solutions/compare.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.manufactured_solutions.train import D, F, get_model
from porous_cfd_tpu.data.manufactured import ManufacturedDataset
from porous_cfd_tpu.data.parser import parse_model_type
from porous_cfd_tpu.pipelines.compare import build_arg_parser, compare
from porous_cfd_tpu.train.trainer import load_checkpoint


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = ManufacturedDataset(args.data_dir, args.n_internal, args.n_boundary,
                               D, F, rng=rng, meta_dir=args.meta_dir)
    model1 = get_model(parse_model_type(args.checkpoint), D, F)
    s1, _ = load_checkpoint(args.checkpoint, model1, data.stacked())
    model2 = get_model(parse_model_type(args.checkpoint_other), D, F)
    s2, _ = load_checkpoint(args.checkpoint_other, model2, data.stacked())
    compare(args, model1, s1.params, model2, s2.params, data)


if __name__ == "__main__":
    run()
