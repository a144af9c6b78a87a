"""Manufactured-solutions inference with 2D field plots (reference
examples/manufactured_solutions/inference.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from examples.manufactured_solutions.train import D, F, get_model
from porous_cfd_tpu.data.manufactured import ManufacturedDataset
from porous_cfd_tpu.data.parser import parse_model_type
from porous_cfd_tpu.pipelines.inference import build_arg_parser, predict
from porous_cfd_tpu.train.trainer import load_checkpoint
from porous_cfd_tpu.viz.viz2d import plot_fields


def sample_process_fn(data, target, predicted, case_path, plot_path):
    pts = np.asarray(target["C"])
    zone = np.asarray(target["cellToRegion"])
    plot_fields("Predicted", pts, np.asarray(predicted["U"]),
                np.asarray(predicted["p"]), zone, save_path=plot_path)
    plot_fields("Ground truth", pts, np.asarray(target["U"]),
                np.asarray(target["p"]), zone, save_path=plot_path)
    plot_fields("Absolute error", pts,
                np.abs(np.asarray(predicted["U"]) - np.asarray(target["U"])),
                np.abs(np.asarray(predicted["p"]) - np.asarray(target["p"])),
                zone, plot_streams=False, save_path=plot_path)


def run():
    args = build_arg_parser().parse_args()
    rng = np.random.default_rng(8421)
    data = ManufacturedDataset(args.data_dir, args.n_internal, args.n_boundary,
                               D, F, rng=rng, meta_dir=args.meta_dir)
    model = get_model(parse_model_type(args.checkpoint), D, F)
    state, _ = load_checkpoint(args.checkpoint, model, data.stacked())
    predict(args, model, state.params, data, sample_process_fn)


if __name__ == "__main__":
    run()
