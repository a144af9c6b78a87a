"""duct_variable_boundary evaluation (reference
examples/duct_variable_boundary/evaluate.py): common stats + per-case d/f,
inlet speed/angle extraction, MAE-vs-angle curve, (d, U) MAE heatmap and
pressure-drop metric."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import pandas

from examples.duct_variable_boundary.inference import load_model_and_params
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.pipelines.evaluation import (build_arg_parser, evaluate,
                                                 extract_angle, extract_coef,
                                                 extract_u_magnitude,
                                                 get_pressure_drop)
from porous_cfd_tpu.viz.common import (plot_errors_vs_multi_vars,
                                       plot_errors_vs_var, plot_multi_bar)


def sample_process(data, predicted, target, extras):
    """Per-batch parameter extraction (duct_variable_boundary/evaluate.py:33-54)."""
    d = np.round(extract_coef(np.asarray(target["d"]),
                              data.normalizers["d"])).astype(np.int64)
    f = extract_coef(np.asarray(target["f"]), data.normalizers["f"])
    u_mag = extract_u_magnitude(np.asarray(target["inlet"]["U-inlet"]),
                                data.normalizers["U"], 0.025)
    angle = extract_angle(np.asarray(target["inlet"]["U"]),
                          data.normalizers["U"])
    p_s = data.normalizers["p"]
    tgt = get_pressure_drop(np.asarray(p_s.inverse_transform(target["inlet"]["p"])),
                            np.asarray(p_s.inverse_transform(target["outlet"]["p"])))
    pred = get_pressure_drop(
        np.asarray(p_s.inverse_transform(predicted["inlet"]["p"])),
        np.asarray(p_s.inverse_transform(predicted["outlet"]["p"])))
    return {"d": d, "f": f, "U inlet": u_mag, "Angle": angle,
            "Predicted drop": np.asarray([pred]),
            "Target drop": np.asarray([tgt])}


def postprocess_fn(data, results, plots_path):
    """Aggregate angle/heatmap/pressure-drop plots
    (duct_variable_boundary/evaluate.py:57-74)."""
    errors = np.concatenate([results["U error"], results["p error"]], -1)
    per_case_mae = np.concatenate(np.mean(errors, axis=-2, keepdims=True))
    angles = np.asarray(results["Angle"]).flatten()
    uniq = np.unique(angles)
    mae_by_angle = np.concatenate(
        [np.mean(per_case_mae[angles == a], axis=0, keepdims=True)
         for a in uniq])
    plot_errors_vs_var("MAE by inlet angle", mae_by_angle, uniq,
                       ["Angle", "MAE"], plots_path)

    d = np.asarray(results["d"]).flatten()
    u_inlet = np.asarray(results["U inlet"]).flatten()
    plot_errors_vs_multi_vars("MAE heatmap", per_case_mae, d.astype(np.int64),
                              u_inlet, ["D", "U"], plots_path)

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
