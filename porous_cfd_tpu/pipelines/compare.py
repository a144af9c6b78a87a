"""Model comparison pipeline (reference ``common/compare.py``): evaluates two
checkpoints on the same data, plots per-case error deltas and common metrics,
and runs Kruskal-Wallis / Mann-Whitney U / Shapiro / Levene / ANOVA statistical
tests, saved to ``Test.csv`` / ``Shapiro.csv``.
"""
from __future__ import annotations

from argparse import ArgumentParser, Namespace
from pathlib import Path

import numpy as np
import pandas
from pandas import DataFrame
from scipy.stats import f_oneway, kruskal, levene, mannwhitneyu, shapiro

from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.pipelines import evaluation
from porous_cfd_tpu.pipelines.evaluation import evaluate
from porous_cfd_tpu.viz.common import (get_fields_names, plot_multi_bar,
                                       plot_per_case)


def build_arg_parser() -> ArgumentParser:
    """Evaluation CLI + --checkpoint-other (compare.py:15-22)."""
    p = evaluation.build_arg_parser()
    p.add_argument("--checkpoint-other", type=str)
    return p


def switch_active_checkpoint(args: Namespace) -> Namespace:
    d = vars(args)
    d["checkpoint"], d["checkpoint_other"] = (d["checkpoint_other"],
                                              d["checkpoint"])
    return Namespace(**d)


def get_name_from_checkpoint(checkpoint: str) -> str:
    """Model name from the checkpoint's parent directory (compare.py:53-60)."""
    name = Path(checkpoint).parent.name.replace("-", " ")
    return name if name[0].isupper() else name.capitalize()


def plot_error_comparison(name_1, name_2, errors_1: DataFrame,
                          errors_2: DataFrame, plots_path):
    for m in set(errors_1.index).intersection(errors_2.index):
        v1, v2 = errors_1.loc[m].values, errors_2.loc[m].values
        plot_multi_bar(m, {name_1: v1.tolist(), name_2: v2.tolist()},
                       get_fields_names(v1), plots_path)


def plot_max_difference(title, errors_1, errors_2, reduction_f, plots_path):
    delta = reduction_f(errors_1, axis=-2) - reduction_f(errors_2, axis=-2)
    plot_per_case(title, delta, plots_path)


def compare(args: Namespace, model1: PinnModel, params1,
            model2: PinnModel, params2, data: FoamDataset) -> DataFrame:
    """Full comparison (compare.py:79-152). Results under
    ``<ckpt1_grandparent>/comparisons/<name1> vs <name2>/<split>/``."""
    results: dict = {}
    eval_paths: list = []

    def postprocess_fn(dataset, partial_results, plots_path):
        results[compare.active] = partial_results
        eval_paths.append(plots_path)

    name_1 = get_name_from_checkpoint(args.checkpoint)
    name_2 = get_name_from_checkpoint(args.checkpoint_other)

    compare.active = name_1
    evaluate(args, model1, params1, data, False, None, postprocess_fn)
    compare.active = name_2
    args = switch_active_checkpoint(args)
    evaluate(args, model2, params2, data, False, None, postprocess_fn)

    plots_dir = (Path(args.checkpoint).parent.parent / "comparisons"
                 / f"{name_1} vs {name_2}" / Path(data.data_dir).name)
    plots_dir.mkdir(exist_ok=True, parents=True)

    errors_1 = np.concatenate([results[name_1]["U error"],
                               results[name_1]["p error"]], axis=-1)
    errors_2 = np.concatenate([results[name_2]["U error"],
                               results[name_2]["p error"]], axis=-1)

    plot_max_difference("Max error difference", errors_1, errors_2, np.max,
                        plots_dir)
    plot_max_difference("Average error difference", errors_1, errors_2,
                        np.mean, plots_dir)

    errors_1 = np.concatenate(errors_1)
    errors_2 = np.concatenate(errors_2)

    index = ["Ux", "Uy", "Uz"][:errors_2.shape[-1] - 1] + ["p"]
    results_df = DataFrame(index=index,
                           columns=["Kruskal-Wallis", "Mann-Whitney U", "ANOVA"])
    results_df["Kruskal-Wallis"] = kruskal(
        errors_1, errors_2, axis=0, keepdims=True)[-1].flatten()
    results_df["Mann-Whitney U"] = mannwhitneyu(
        errors_1, errors_2, axis=0, keepdims=True)[-1].flatten()

    shapiro_df = DataFrame(index=index, columns=[name_1, name_2])
    t1, t2 = np.log(errors_1), np.log(errors_2)
    shapiro_df[name_1] = shapiro(t1, axis=0, keepdims=True)[-1].flatten()
    shapiro_df[name_2] = shapiro(t2, axis=0, keepdims=True)[-1].flatten()

    levene_p = [levene(t1[:, i], t2[:, i], center="mean")[-1]
                for i in range(t1.shape[-1])]
    print("Homoscedasticity transformed p-values")
    print(DataFrame(data=[levene_p], columns=index), "\n")

    results_df["ANOVA"] = f_oneway(t1, t2, axis=0)[-1].flatten()

    print("Log transformed errors normality test p-values")
    print(shapiro_df, "\n")
    print("Statistical tests p-values")
    print(results_df)

    if eval_paths[0] is not None:
        eval1 = pandas.read_csv(f"{eval_paths[0]}/Errors.csv", index_col=0)
        eval2 = pandas.read_csv(f"{eval_paths[1]}/Errors.csv", index_col=0)
        plot_error_comparison(name_1, name_2, eval1, eval2, plots_dir)
    shapiro_df.to_csv(plots_dir / "Shapiro.csv")
    results_df.to_csv(plots_dir / "Test.csv")
    return results_df
