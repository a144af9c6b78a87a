"""abc inference (reference examples/abc/inference.py): 3D scatter field plots
of predictions vs ground truth."""
import sys
from argparse import Namespace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.abc.train import get_model
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.data.parser import parse_model_type
from porous_cfd_tpu.pipelines.inference import build_arg_parser, predict
from porous_cfd_tpu.train.trainer import load_checkpoint
from porous_cfd_tpu.viz.viz3d import plot_fields_3d


def load_model_and_params(args, data):
    model = get_model(Namespace(**{**vars(args),
                                   "model": parse_model_type(args.checkpoint),
                                   "loss_scaler": "fixed"}), data.normalizers)
    state, _ = load_checkpoint(args.checkpoint, model, data.stacked())
    return model, state.params


def sample_process_fn(data, target, predicted, case_path, plot_path):
    c_s, u_s, p_s = (data.normalizers["C"], data.normalizers["U"],
                     data.normalizers["p"])
    pts = np.asarray(c_s.inverse_transform(target["C"]))
    pred_u = np.asarray(u_s.inverse_transform(predicted["U"]))
    pred_p = np.asarray(p_s.inverse_transform(predicted["p"]))
    tgt_u = np.asarray(u_s.inverse_transform(target["U"]))
    tgt_p = np.asarray(p_s.inverse_transform(target["p"]))
    plot_fields_3d("Predicted", pts, pred_u, pred_p, save_path=plot_path)
    plot_fields_3d("Ground truth", pts, tgt_u, tgt_p, save_path=plot_path)
    plot_fields_3d("Absolute error", pts, np.abs(pred_u - tgt_u),
                   np.abs(pred_p - tgt_p), save_path=plot_path)


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = FoamDataset(args.data_dir, args.n_internal, args.n_boundary,
                       args.n_observations, rng, args.meta_dir)
    model, params = load_model_and_params(args, data)
    predict(args, model, params, data, sample_process_fn)


if __name__ == "__main__":
    run()
