"""windbreaks evaluation (reference examples/windbreaks/evaluate.py): common
statistics + solid(house)-surface errors and (d, U inlet) MAE heatmap."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.windbreaks.inference import load_model_and_params
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.pipelines.evaluation import (build_arg_parser, evaluate,
                                                 extract_coef,
                                                 extract_u_magnitude)
from porous_cfd_tpu.viz.common import (plot_data_dist, plot_errors,
                                       plot_errors_vs_multi_vars)


def sample_process(data, predicted, target, extras):
    """House-surface errors + per-case parameters
    (windbreaks/evaluate.py:33-56)."""
    u_s, p_s = data.normalizers["U"], data.normalizers["p"]
    solid_u_err = np.abs(
        np.asarray(u_s.inverse_transform(predicted["solid"]["U"]))
        - np.asarray(u_s.inverse_transform(target["solid"]["U"])))
    solid_p_err = np.abs(
        np.asarray(p_s.inverse_transform(predicted["solid"]["p"]))
        - np.asarray(p_s.inverse_transform(target["solid"]["p"])))
    d = np.round(extract_coef(np.asarray(target["d"]),
                              data.normalizers["d"])).astype(np.int64)
    f = extract_coef(np.asarray(target["f"]), data.normalizers["f"])
    u_mag = extract_u_magnitude(np.asarray(target["inlet"]["Ux-inlet"]),
                                data.normalizers["U"][0], 1e-6)
    return {"U error solid": solid_u_err, "p error solid": solid_p_err,
            "d": d, "f": f, "U inlet": u_mag}


def postprocess_fn(data, results, plots_path):
    """Solid-surface error plots + MAE heatmap (windbreaks/evaluate.py:59-74)."""
    errors = np.concatenate([results["U error"], results["p error"]], -1)
    u_solid = np.concatenate(results["U error solid"])
    p_solid = np.concatenate(results["p error solid"])
    plot_data_dist("Solid Absolute error distribution", u_solid, p_solid,
                   save_path=plots_path)
    solid = np.concatenate([u_solid, p_solid], axis=-1)
    plot_errors("Solid Average relative error",
                np.average(solid, axis=0).tolist(), save_path=plots_path)

    per_case_mae = np.concatenate(np.mean(errors, axis=-2, keepdims=True))
    d = np.asarray(results["d"]).flatten()
    u_inlet = np.asarray(results["U inlet"]).flatten()
    plot_errors_vs_multi_vars("MAE heatmap", per_case_mae, d.astype(np.int64),
                              u_inlet, ["D", "U"], plots_path)


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
