"""windbreaks two-checkpoint comparison (reference examples/windbreaks/compare.py)."""
import sys
from argparse import Namespace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.windbreaks.inference import load_model_and_params
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.pipelines.compare import build_arg_parser, compare


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = FoamDataset(args.data_dir, args.n_internal, args.n_boundary,
                       args.n_observations, rng, args.meta_dir)
    model1, params1 = load_model_and_params(args, data)
    other = Namespace(**{**vars(args), "checkpoint": args.checkpoint_other})
    model2, params2 = load_model_and_params(other, data)
    compare(args, model1, params1, model2, params2, data)


if __name__ == "__main__":
    run()
