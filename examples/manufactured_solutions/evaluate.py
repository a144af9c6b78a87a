"""Manufactured-solutions evaluation (reference
examples/manufactured_solutions/evaluate.py): residual statistics vs the
analytic solution, no OpenFOAM timing."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.manufactured_solutions.train import D, F, get_model
from porous_cfd_tpu.data.manufactured import ManufacturedDataset
from porous_cfd_tpu.data.parser import parse_model_type
from porous_cfd_tpu.pipelines.evaluation import build_arg_parser, evaluate
from porous_cfd_tpu.train.trainer import load_checkpoint


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = ManufacturedDataset(args.data_dir, args.n_internal, args.n_boundary,
                               D, F, rng=rng, meta_dir=args.meta_dir)
    model = get_model(parse_model_type(args.checkpoint), D, F)
    state, _ = load_checkpoint(args.checkpoint, model, data.stacked())
    evaluate(args, model, state.params, data, enable_timing=False)


if __name__ == "__main__":
    run()
