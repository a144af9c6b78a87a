"""duct_fixed_boundary evaluation: common statistics + pressure-drop metric
(reference examples/duct_fixed_boundary/evaluate.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import pandas

from examples.duct_fixed_boundary.inference import load_model_and_params
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.pipelines.evaluation import (build_arg_parser, evaluate,
                                                 get_pressure_drop)
from porous_cfd_tpu.viz.common import plot_multi_bar


def sample_process(data, predicted, target, extras):
    """Pressure drop across inlet/outlet (duct_fixed_boundary/evaluate.py:29-38)."""
    p_s = data.normalizers["p"]
    tgt = get_pressure_drop(np.asarray(p_s.inverse_transform(target["inlet"]["p"])),
                            np.asarray(p_s.inverse_transform(target["outlet"]["p"])))
    pred = get_pressure_drop(
        np.asarray(p_s.inverse_transform(predicted["inlet"]["p"])),
        np.asarray(p_s.inverse_transform(predicted["outlet"]["p"])))
    return {"Predicted drop": np.asarray([pred]), "Target drop": np.asarray([tgt])}


def postprocess_fn(data, results, plots_path):
    mean_tgt = np.mean(results["Predicted drop"])
    mean_pred = np.mean(results["Target drop"])
    plot_multi_bar("Pressure drop",
                   {"Predicted": [mean_pred], "True": [mean_tgt]}, ["$p$"],
                   plots_path)
    if plots_path is not None:
        df = pandas.read_csv(f"{plots_path}/Errors.csv")
        df.loc["Pressure drop"] = {"$p$": abs(mean_pred - mean_tgt)}
        df.to_csv(f"{plots_path}/Errors.csv")


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
