"""OpenFOAM case-template completeness (VERDICT r1 missing #1).

The manifest below is the reference's full per-experiment template file set
(every dict `generate_data` / the Run scripts consume: controlDict, fvSchemes,
fvSolution, 0/{U,p}, blockMeshDict, momentumError function objects, ...).
Runs everywhere — no OpenFOAM needed; an OpenFOAM-gated end-to-end datagen
test lives in test_generator_e2e.py.
"""
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"

# a two-stage 2D experiment: snappyHexMesh meshing case + simpleFoam solve case
TWO_STAGE = [
    "simpleFoam/0/U",
    "simpleFoam/0/p",
    "simpleFoam/Clean",
    "simpleFoam/Run",
    "simpleFoam/constant/transportProperties",
    "simpleFoam/constant/turbulenceProperties",
    "simpleFoam/system/controlDict",
    "simpleFoam/system/decomposeParDict",
    "simpleFoam/system/extrudeMeshDict",
    "simpleFoam/system/fvOptions",
    "simpleFoam/system/fvSchemes",
    "simpleFoam/system/fvSolution",
    "simpleFoam/system/momentumError",
    "snappyHexMesh/Clean",
    "snappyHexMesh/Run",
    "snappyHexMesh/system/blockMeshDict",
    "snappyHexMesh/system/changeDictionaryDict",
    "snappyHexMesh/system/controlDict",
    "snappyHexMesh/system/createPatchDict",
    "snappyHexMesh/system/decomposeParDict",
    "snappyHexMesh/system/fvOptions",
    "snappyHexMesh/system/fvSchemes",
    "snappyHexMesh/system/fvSolution",
    "snappyHexMesh/system/snappyHexMeshDict",
    "snappyHexMesh/system/surfaceFeatureExtractDict",
]

# a single-stage 3D experiment: one combined mesh+solve case
SINGLE_STAGE = [
    "0/U",
    "0/p",
    "Clean",
    "Run",
    "constant/transportProperties",
    "constant/turbulenceProperties",
    "system/blockMeshDict",
    "system/controlDict",
    "system/createPatchDict",
    "system/decomposeParDict",
    "system/fvOptions",
    "system/fvSchemes",
    "system/fvSolution",
    "system/momentumError",
    "system/snappyHexMeshDict",
    "system/surfaceFeatureExtractDict",
]

MANIFEST = {
    "abc": SINGLE_STAGE,
    "duct_fixed_boundary": TWO_STAGE,
    "duct_fixed_boundary_hard": TWO_STAGE,
    "duct_variable_boundary": TWO_STAGE,
    # manufactured solutions only meshes (no simulation), so no momentumError
    "manufactured_solutions": [p for p in TWO_STAGE
                               if not p.endswith("momentumError")],
    "vertical_duct_fixed_boundary": TWO_STAGE,
    "windbreaks": SINGLE_STAGE,
}


@pytest.mark.parametrize("experiment", sorted(MANIFEST))
def test_case_template_complete(experiment):
    root = EXAMPLES / experiment / "assets" / "openfoam-case-template"
    missing = [p for p in MANIFEST[experiment] if not (root / p).is_file()]
    assert not missing, f"{experiment} template missing: {missing}"


@pytest.mark.parametrize("experiment", sorted(MANIFEST))
def test_run_scripts_executable_and_wired(experiment):
    import os

    root = EXAMPLES / experiment / "assets" / "openfoam-case-template"
    for script in root.glob("**/Run"):
        assert os.access(script, os.X_OK), f"{script} not executable"
        text = script.read_text()
        assert "log_output" in text  # failure -> log.txt contract
    # the solve-stage Run must time the solver (timing.txt contract,
    # parsed by data/parser.parse_elapsed_time)
    solve_run = (root / "simpleFoam/Run" if (root / "simpleFoam").is_dir()
                 else root / "Run")
    assert "timing.txt" in solve_run.read_text()


@pytest.mark.parametrize("experiment",
                         [e for e in sorted(MANIFEST)
                          if e != "manufactured_solutions"])
def test_momentum_gradients_produced_for_momentum_error(experiment):
    """write_momentum_error needs grad(U)/grad(p)/second gradients: the solve
    controlDict must include the momentumError function objects."""
    root = EXAMPLES / experiment / "assets" / "openfoam-case-template"
    sysdir = root / ("simpleFoam/system" if (root / "simpleFoam").is_dir()
                     else "system")
    control = (sysdir / "controlDict").read_text()
    assert "momentumError" in control
    fo = (sysdir / "momentumError").read_text()
    for field in ("grad", "p", "U"):
        assert field in fo
