"""Synthetic foam-style batches with the full dataset schema (variable
boundaries, porosity coefficient fields, per-patch subdomains).

Used by unit tests and the benchmark harness to exercise every model family
without OpenFOAM: the schema matches what ``FoamDataset`` produces for the
duct_variable_boundary experiment (4 patches, U-inlet variable columns, d/f
coefficient fields, SDF + one-hot boundaryId features).
"""
from __future__ import annotations

import numpy as np

from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.data.scalers import Normalizer, StandardScaler

FOAM_LABELS = {
    "Cx": None, "Cy": None,
    "cellToRegion": None,
    "dx": None, "dy": None,
    "fx": None, "fy": None,
    "Ux": None, "Uy": None,
    "p": None,
    "U-inletx": None, "U-inlety": None,
    "sdf": None,
    "boundaryIdinlet": None, "boundaryIdinterface": None,
    "boundaryIdoutlet": None, "boundaryIdwalls": None,
    "C": ["Cx", "Cy"],
    "d": ["dx", "dy"],
    "f": ["fx", "fy"],
    "U": ["Ux", "Uy"],
    "U-inlet": ["U-inletx", "U-inlety"],
    "boundaryId": ["boundaryIdinlet", "boundaryIdinterface",
                   "boundaryIdoutlet", "boundaryIdwalls"],
}

N_COLS = sum(1 for v in FOAM_LABELS.values() if v is None)

VARIABLE_BOUNDARIES = {"Subdomains": ["inlet", "internal"],
                       "Features": ["U-inlet", "d", "f"]}

PATCHES = ["inlet", "interface", "outlet", "walls"]


def make_foam_batch(batch_size=2, n_internal=24, n_boundary=16, n_obs=8,
                    seed=0, rng=None) -> FoamData:
    """Random batch with the duct_variable_boundary-style schema. Boundary
    points are split evenly over the 4 patches; variable-BC columns are zero
    outside their patch (foam_dataset.py:315-333 semantics)."""
    rng = rng or np.random.default_rng(seed)
    assert n_boundary % 4 == 0
    per_patch = n_boundary // 4
    n = n_internal + n_boundary

    def one_case():
        data = np.zeros((n, N_COLS), np.float32)
        cols = [k for k, v in FOAM_LABELS.items() if v is None]
        ix = {c: i for i, c in enumerate(cols)}
        pts = rng.uniform(-1, 1, size=(n, 2))
        data[:, ix["Cx"]], data[:, ix["Cy"]] = pts[:, 0], pts[:, 1]
        zone = (pts[:, 0] > 0.3).astype(np.float32)
        zone[n_internal:] = 0
        data[:, ix["cellToRegion"]] = zone
        data[:, ix["dx"]] = data[:, ix["dy"]] = zone * 0.7
        data[:, ix["fx"]] = data[:, ix["fy"]] = zone * 0.4
        data[:, ix["Ux"]] = rng.normal(size=n)
        data[:, ix["Uy"]] = rng.normal(size=n)
        data[:, ix["p"]] = rng.normal(size=n)
        data[:, ix["sdf"]] = rng.uniform(0, 1, size=n)
        for pi, patch in enumerate(PATCHES):
            rows = slice(n_internal + pi * per_patch,
                         n_internal + (pi + 1) * per_patch)
            data[rows, ix[f"boundaryId{patch}"]] = 1.0
        inlet_rows = slice(n_internal, n_internal + per_patch)
        data[inlet_rows, ix["U-inletx"]] = data[inlet_rows, ix["Ux"]]
        data[inlet_rows, ix["U-inlety"]] = data[inlet_rows, ix["Uy"]]

        domain = {
            "internal": np.arange(n_internal),
            "boundary": np.arange(n_boundary) + n_internal,
            "obs": rng.choice(n_internal, size=n_obs, replace=False),
        }
        for pi, patch in enumerate(PATCHES):
            domain[patch] = np.arange(per_patch) + n_internal + pi * per_patch
        return data, domain

    cases = [one_case() for _ in range(batch_size)]
    data = np.stack([c[0] for c in cases])
    domain = {k: np.stack([c[1][k] for c in cases]).astype(np.int32)
              for k in cases[0][1]}
    return FoamData(data, FOAM_LABELS, domain)


def make_scalers() -> dict:
    """Plausible scaler statistics for the synthetic schema."""
    return {
        "U": StandardScaler(np.array([1.2, 0.8], np.float32),
                            np.array([0.1, -0.1], np.float32)),
        "p": StandardScaler(np.array([2.0], np.float32),
                            np.array([0.5], np.float32)),
        "C": StandardScaler(np.array([1.5, 1.1], np.float32),
                            np.array([0.0, 0.0], np.float32)),
        "d": Normalizer(np.array([0.0, 0.0], np.float32),
                        np.array([20000.0, 20000.0], np.float32)),
        "f": Normalizer(np.array([0.0, 0.0], np.float32),
                        np.array([100.0, 100.0], np.float32)),
    }
