"""vertical_duct_fixed_boundary inference (reference
examples/vertical_duct_fixed_boundary/inference.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.duct_fixed_boundary.inference import (load_model_and_params,
                                                    sample_process_fn)
from examples.vertical_duct_fixed_boundary.vertical_duct_dataset import \
    VerticalDuctDataset
from porous_cfd_tpu.pipelines.inference import build_arg_parser, predict


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = VerticalDuctDataset(args.data_dir, args.n_internal, args.n_boundary,
                               args.n_observations, rng, args.meta_dir)
    model, params = load_model_and_params(args, data)
    predict(args, model, params, data, sample_process_fn)


if __name__ == "__main__":
    run()
