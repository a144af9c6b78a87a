"""Manufactured-solutions data generation (reference
examples/manufactured_solutions/generate_data.py).

The reference drives Blender to augment meshes and snappyHexMesh to mesh the
cases (geometry only — no solver run). When Blender/OpenFOAM are available the
ported mesh pipeline in ``porous_cfd_tpu.datagen.generator_2d`` is used;
otherwise the point clouds are synthesized directly in the same on-disk case
format, which is sufficient for this experiment (only C + cellToRegion are
consumed; U/p/forcing are analytic)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from porous_cfd_tpu.datagen import synthetic_case
from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points


def run(dest_dir: str = "data", seed: int = 8421,
        splits={"train": 16, "val": 4, "test": 4}):
    rng = np.random.default_rng(seed)
    dest = Path(dest_dir)
    for split, n_cases in splits.items():
        synthetic_case.write_manufactured_split(dest / split, n_cases, rng)
        synthetic_case.write_data_config(
            dest / split, fields=["C", "cellToRegion"], variable_boundaries={},
            normalize={"Scale": [], "Standardize": []}, dims=["x", "y"])
        generate_meta(dest / split, "C", "cellToRegion", max_dim=2)
    generate_min_points(dest)


if __name__ == "__main__":
    run()
