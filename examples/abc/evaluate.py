"""abc evaluation (reference examples/abc/evaluate.py): common statistics +
MAE-vs-inlet-speed analysis."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.abc.inference import load_model_and_params
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.pipelines.evaluation import (build_arg_parser, evaluate,
                                                 extract_u_magnitude)
from porous_cfd_tpu.viz.common import plot_errors_vs_var


def sample_process(data, predicted, target, extras):
    u_mag = extract_u_magnitude(np.asarray(target["inlet"]["U"]),
                                data.normalizers["U"], 0.025)
    return {"U inlet": u_mag}


def postprocess_fn(data, results, plots_path):
    errors = np.concatenate([results["U error"], results["p error"]], -1)
    per_case_mae = np.concatenate(np.mean(errors, axis=-2, keepdims=True))
    u_inlet = np.asarray(results["U inlet"]).flatten()
    plot_errors_vs_var("MAE by inlet speed", per_case_mae, u_inlet,
                       ["U inlet", "MAE"], plots_path)


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = FoamDataset(args.data_dir, args.n_internal, args.n_boundary,
                       args.n_observations, rng, args.meta_dir,
                       extra_fields=["momentError", "div(phi)"])
    model, params = load_model_and_params(args, data)
    evaluate(args, model, params, data, True, sample_process, postprocess_fn)


if __name__ == "__main__":
    run()
