"""Golden-file tests: OpenFOAM IO roundtrip, parser parity, FoamDataset
semantics (stratified sampling, SDF, boundaryId, variable columns, scalers)."""
import json

import numpy as np
import pytest

from porous_cfd_tpu.data import foam_io, parser
from porous_cfd_tpu.data.dataset import FoamDataset
from porous_cfd_tpu.data.manufactured import ManufacturedDataset
from porous_cfd_tpu.datagen import synthetic_case
from porous_cfd_tpu.datagen.meta import generate_meta, generate_min_points


@pytest.fixture(scope="module")
def foam_root(tmp_path_factory):
    """data root with train/val splits of full solver-style cases."""
    root = tmp_path_factory.mktemp("foamdata")
    rng = np.random.default_rng(8421)
    for split, n in [("train", 4), ("val", 2)]:
        synthetic_case.write_foam_split(root / split, n, rng, n_internal=300,
                                        n_per_patch=40, variable=True)
        synthetic_case.write_data_config(
            root / split,
            fields=["C", "U", "p", "cellToRegion", "d", "f"],
            variable_boundaries={"U": "inlet"},
            normalize={"Scale": ["d", "f"], "Standardize": ["C", "U", "p"]},
            dims=["x", "y"])
        generate_meta(root / split, "C", "U", "p", "cellToRegion", "d", "f",
                      max_dim=2)
    generate_min_points(root)
    return root


def test_field_file_roundtrip(tmp_path):
    vals = np.random.default_rng(0).normal(size=(7, 3))
    foam_io.write_field_file(tmp_path / "U", "volVectorField", "U", vals,
                             boundary={"walls": {"type": "fixedValue",
                                                 "value": vals[:2]}})
    rd = foam_io.read_field_file(tmp_path / "U")
    np.testing.assert_allclose(rd["internal"], vals)
    assert rd["boundary"]["walls"]["type"] == "fixedValue"


def test_scalar_field_roundtrip(tmp_path):
    vals = np.arange(5, dtype=np.float64)
    foam_io.write_field_file(tmp_path / "p", "volScalarField", "p", vals)
    np.testing.assert_allclose(foam_io.read_field_file(tmp_path / "p")["internal"],
                               vals)


def test_uniform_field_parse(tmp_path):
    (tmp_path / "U").write_text("""FoamFile
{
    class volVectorField;
    object U;
}
dimensions [0 1 -1 0 0 0 0];
internalField uniform (0.2 0 0);
boundaryField
{
    inlet { type fixedValue; }
}
""")
    rd = foam_io.read_field_file(tmp_path / "U")
    np.testing.assert_allclose(rd["internal"], [0.2, 0, 0])
    assert rd["uniform"]


def test_postprocess_roundtrip(tmp_path):
    vec = np.random.default_rng(1).normal(size=(6, 3))
    foam_io.write_postprocess_field(tmp_path / "U", vec)
    np.testing.assert_allclose(foam_io.read_postprocess_field(tmp_path / "U"), vec)
    sca = np.arange(4.0)
    foam_io.write_postprocess_field(tmp_path / "p", sca)
    np.testing.assert_allclose(foam_io.read_postprocess_field(tmp_path / "p"), sca)


def test_postprocess_compact_uniform(tmp_path):
    (tmp_path / "p").write_text("5{3.25}\n")
    np.testing.assert_allclose(foam_io.read_postprocess_field(tmp_path / "p"),
                               np.full(5, 3.25))
    (tmp_path / "U").write_text("3{(1 2 3)}\n")
    np.testing.assert_allclose(foam_io.read_postprocess_field(tmp_path / "U"),
                               np.tile([1, 2, 3], (3, 1)))


def test_dict_parse_fvoptions(tmp_path):
    rng = np.random.default_rng(2)
    synthetic_case.write_case(tmp_path / "case", rng.uniform(size=(10, 2)),
                              np.zeros(10), {"walls": rng.uniform(size=(4, 2))},
                              d=123.0, f=4.5, nu=1e-3)
    np.testing.assert_allclose(parser.parse_coef(str(tmp_path / "case"), "d"),
                               [123, 123, 123])
    assert parser.parse_nu(str(tmp_path / "case")) == pytest.approx(1e-3)


def test_parse_internal_and_boundary(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.uniform(size=(20, 2))
    zone = (pts[:, 0] > 0.5).astype(float)
    u = rng.normal(size=(20, 2))
    p = rng.normal(size=20)
    walls = rng.uniform(size=(6, 2))
    wu = rng.normal(size=(6, 2))
    synthetic_case.write_case(
        tmp_path / "c", pts, zone, {"walls": walls},
        fields={"U": u, "p": p},
        patch_fields={"walls": {"U": wu, "p": rng.normal(size=6)}},
        d=100.0, f=2.0)
    internal = parser.parse_internal_fields(
        str(tmp_path / "c"), "C", "U", "p", "cellToRegion", "d", "f", max_dim=2)
    np.testing.assert_allclose(internal["C"], pts)
    np.testing.assert_allclose(internal["U"], u)
    np.testing.assert_allclose(internal["p"][:, 0], p)
    np.testing.assert_allclose(internal["d"],
                               np.tile(zone[:, None] * 100.0, (1, 2)))
    bnd = parser.parse_boundary_fields(
        str(tmp_path / "c"), "C", "U", "p", "cellToRegion", "d", "f", max_dim=2)
    np.testing.assert_allclose(bnd["walls"]["C"], walls)
    np.testing.assert_allclose(bnd["walls"]["U"], wu)
    np.testing.assert_allclose(bnd["walls"]["d"], 0.0)
    np.testing.assert_allclose(bnd["walls"]["cellToRegion"], 0.0)


def test_meta_and_min_points(foam_root):
    with open(foam_root / "train" / "meta.json") as f:
        meta = json.load(f)
    assert set(meta["Points"]) == {"internal", "porous", "fluid", "inlet",
                                   "interface", "outlet", "walls"}
    assert meta["Points"]["internal"]["Mean"] == 300
    assert meta["Points"]["inlet"]["Min"] == 40
    assert len(meta["Stats"]["U"]["Mean"]) == 2
    assert len(meta["Stats"]["p"]["Mean"]) == 1
    assert meta["Timing"]["Total"] > 0
    with open(foam_root / "min_points.json") as f:
        mp = json.load(f)
    assert mp["internal"] == 300 and mp["walls"] == 40


def test_foam_dataset_loads(foam_root):
    rng = np.random.default_rng(8421)
    ds = FoamDataset(str(foam_root / "train"), 100, 80, 30, rng)
    assert len(ds) == 4
    case = ds[0]
    assert case.data.shape == (180, case.data.shape[1])
    # domains
    assert case.domain["internal"].shape == (100,)
    assert case.domain["boundary"].shape == (80,)
    assert case.domain["obs"].shape == (30,)
    assert case.domain["obs"].max() < 100  # obs inside internal rows
    # per-patch domains are contiguous and ordered
    sizes = {p: len(case.domain[p]) for p in
             ["inlet", "interface", "outlet", "walls"]}
    assert sum(sizes.values()) == 80

    # one-hot boundary id: exactly one bit on boundary rows, zero internal
    bid = np.asarray(case["boundaryId"])
    assert np.all(bid[:100].sum(-1) == 0)
    assert np.all(bid[100:].sum(-1) == 1)

    # sdf: boundary positive, internal porous negative
    sdf = np.asarray(case["sdf"])[:, 0]
    zone = np.asarray(case["cellToRegion"])[:, 0]
    assert np.all(sdf[100:] >= 0)
    porous = zone[:100] > 0
    assert np.all(sdf[:100][porous] <= 0)
    assert np.abs(sdf).max() == pytest.approx(1.0)

    # variable boundary column: nonzero only on inlet rows
    vin = np.asarray(case["U-inlet"])
    inlet_rows = np.asarray(case.domain["inlet"])
    mask = np.zeros(180, bool)
    mask[inlet_rows] = True
    assert np.all(vin[~mask] == 0)
    assert np.any(vin[mask] != 0)

    # normalization: standardized U over all cases has ~0 mean and ~unit std
    stacked = ds.stacked()
    u = np.asarray(stacked["U"]).reshape(-1, 2)
    assert abs(u.mean()) < 0.3 and 0.5 < u.std() < 1.5


def test_foam_dataset_stratified_internal(foam_root):
    rng = np.random.default_rng(0)
    ds = FoamDataset(str(foam_root / "train"), 100, 80, 10, rng)
    meta = ds.meta["Points"]
    target = ds.get_stratified_sampling_n(["fluid", "porous"], 100)
    assert target.sum() == 100
    # proportionality to mean counts (fluid bigger than porous here)
    assert target[0] > target[1]
    case = ds[0]
    zone = np.asarray(case["cellToRegion"])[:100, 0]
    assert (zone > 0).sum() == target[1]


def test_sample_size_constraint(foam_root):
    with pytest.raises(ValueError):
        FoamDataset(str(foam_root / "train"), 10 ** 6, 80, 10,
                    np.random.default_rng(0))


def test_dataset_determinism(foam_root):
    a = FoamDataset(str(foam_root / "train"), 64, 40, 8,
                    np.random.default_rng(7))
    b = FoamDataset(str(foam_root / "train"), 64, 40, 8,
                    np.random.default_rng(7))
    np.testing.assert_array_equal(a[0].data, b[0].data)
    np.testing.assert_array_equal(np.asarray(a[0].domain["obs"]),
                                  np.asarray(b[0].domain["obs"]))


def test_manufactured_dataset(tmp_path):
    rng = np.random.default_rng(8421)
    synthetic_case.write_manufactured_split(tmp_path / "train", 3, rng,
                                            n_internal=150, n_per_patch=30)
    synthetic_case.write_data_config(
        tmp_path / "train", fields=["C", "cellToRegion"],
        variable_boundaries={}, normalize={"Scale": [], "Standardize": []},
        dims=["x", "y"])
    generate_meta(tmp_path / "train", "C", "cellToRegion", max_dim=2)
    generate_min_points(tmp_path)

    ds = ManufacturedDataset(str(tmp_path / "train"), 80, 40, d=50.0, f=1.0,
                             rng=np.random.default_rng(1))
    case = ds[0]
    for lbl in ["C", "cellToRegion", "sdf", "boundaryId", "f", "U", "p"]:
        assert lbl in case
    # synthesized fields match the analytic solution
    from porous_cfd_tpu.data.manufactured import manufactured_fields
    u, p, forcing = manufactured_fields(np.asarray(case["C"]),
                                        np.asarray(case["cellToRegion"]),
                                        0.01, 50.0, 1.0)
    np.testing.assert_allclose(np.asarray(case["U"]), u, atol=1e-5)
    np.testing.assert_allclose(np.asarray(case["p"]), p, atol=1e-5)
    np.testing.assert_allclose(np.asarray(case["f"]), forcing, atol=1e-5)


def test_resample_fresh_points_same_shapes(foam_root):
    ds = FoamDataset(str(foam_root / "train"), 64, 40, 8,
                     np.random.default_rng(7))
    before = ds[0].data.copy()
    labels = ds[0].labels
    ds.resample(np.random.default_rng(99))
    after = ds[0].data
    assert after.shape == before.shape
    assert ds[0].labels == labels
    assert not np.array_equal(after, before)  # actually a fresh draw
    # deterministic in the rng: same seed -> same sample
    ds2 = FoamDataset(str(foam_root / "train"), 64, 40, 8,
                      np.random.default_rng(7))
    ds2.resample(np.random.default_rng(99))
    np.testing.assert_array_equal(np.asarray(ds2[0].data), np.asarray(after))
    # normalization statistics survive the re-normalize of cached parses
    u = np.asarray(ds.stacked()["U"]).reshape(-1, 2)
    assert abs(u.mean()) < 0.5 and 0.3 < u.std() < 2.0
