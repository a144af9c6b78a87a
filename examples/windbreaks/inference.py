"""windbreaks inference (reference examples/windbreaks/inference.py): 3D
scatter fields annotated with d/f/inlet parameters; streamlines + house plots
when PyVista is available."""
import sys
from argparse import Namespace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.windbreaks.train import get_model
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.data.parser import parse_model_type
from porous_cfd_tpu.pipelines.inference import build_arg_parser, predict
from porous_cfd_tpu.train.trainer import load_checkpoint
from porous_cfd_tpu.viz import viz3d


def load_model_and_params(args, data):
    model = get_model(Namespace(**{**vars(args),
                                   "model": parse_model_type(args.checkpoint),
                                   "loss_scaler": "fixed"}), data.normalizers)
    state, _ = load_checkpoint(args.checkpoint, model, data.stacked())
    return model, state.params


def sample_process_fn(data, target, predicted, case_path, plot_path):
    c_s, u_s, p_s = (data.normalizers["C"], data.normalizers["U"],
                     data.normalizers["p"])
    d_s, f_s = data.normalizers["d"], data.normalizers["f"]
    pts = np.asarray(c_s.inverse_transform(target["C"]))
    d = float(np.max(np.asarray(d_s.inverse_transform(target["d"]))))
    f = float(np.max(np.asarray(f_s.inverse_transform(target["f"]))))
    inlet_ux = float(np.max(np.asarray(
        u_s[0].inverse_transform(target["Ux-inlet"]))))
    pred_u = np.asarray(u_s.inverse_transform(predicted["U"]))
    pred_p = np.asarray(p_s.inverse_transform(predicted["p"]))

    viz3d.plot_fields_3d(
        f"Predicted D={d:.3f} F={f:.3f} Inlet={inlet_ux:.3f}",
        pts, pred_u, pred_p, save_path=plot_path)
    viz3d.plot_fields_3d("Ground truth", pts,
                         np.asarray(u_s.inverse_transform(target["U"])),
                         np.asarray(p_s.inverse_transform(target["p"])),
                         save_path=plot_path)
    solids = {"solid": "oldlace", "mesh": "mediumseagreen"}
    if viz3d.HAS_PYVISTA:
        viz3d.plot_streamlines("Predicted streamlines", case_path, pts, pred_u,
                               pred_p, additional_meshes=solids,
                               save_path=plot_path, interp_radius=7)
    if "solid" in target:
        u_err = np.abs(pred_u - np.asarray(u_s.inverse_transform(target["U"])))
        p_err = np.abs(pred_p - np.asarray(p_s.inverse_transform(target["p"])))
        solid_rows = np.asarray(target.domain["solid"])
        house_obj = Path(case_path) / "constant/triSurface/solid.obj"
        if viz3d.HAS_PYVISTA and house_obj.exists():
            viz3d.plot_houses("House", pts[solid_rows], u_err[solid_rows],
                              p_err[solid_rows], house_obj,
                              save_path=plot_path)
        else:
            viz3d.plot_surface_errors(
                "House surface U error", pts[solid_rows],
                np.linalg.norm(u_err[solid_rows], axis=-1),
                save_path=plot_path)


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = FoamDataset(args.data_dir, args.n_internal, args.n_boundary,
                       args.n_observations, rng, args.meta_dir)
    model, params = load_model_and_params(args, data)
    predict(args, model, params, data, sample_process_fn)


if __name__ == "__main__":
    run()
