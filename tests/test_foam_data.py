import jax.numpy as jnp
import numpy as np
import pytest

from porous_cfd_tpu.data.foam_data import FoamData, collate


LABELS = {"Cx": None, "Cy": None, "p": None, "C": ["Cx", "Cy"]}


def make_case(n=6, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, 3)).astype(np.float32)
    domain = {"internal": np.arange(4), "boundary": np.arange(4, n)}
    return FoamData(jnp.asarray(data), LABELS, domain), data


def test_single_label_column():
    fd, raw = make_case()
    np.testing.assert_allclose(fd["p"], raw[:, 2:3])
    np.testing.assert_allclose(fd["Cx"], raw[:, 0:1])


def test_composite_label_concat():
    fd, raw = make_case()
    np.testing.assert_allclose(fd["C"], raw[:, 0:2])


def test_subdomain_gather_unbatched():
    fd, raw = make_case()
    sub = fd["boundary"]
    np.testing.assert_allclose(sub.data, raw[4:])
    np.testing.assert_allclose(sub["p"], raw[4:, 2:3])
    # re-indexed from zero
    np.testing.assert_array_equal(np.asarray(sub.domain["boundary"]), [0, 1])


def test_subdomain_gather_batched():
    cases = [make_case(seed=s)[0] for s in range(3)]
    batch = collate(cases)
    assert batch.data.shape == (3, 6, 3)
    sub = batch["internal"]
    assert sub.data.shape == (3, 4, 3)
    for b in range(3):
        np.testing.assert_allclose(sub.data[b], cases[b].data[:4])


def test_missing_key_raises():
    fd, _ = make_case()
    with pytest.raises(KeyError):
        fd["nope"]


def test_contains():
    fd, _ = make_case()
    assert "C" in fd and "internal" in fd and "zzz" not in fd


def test_pytree_roundtrip():
    import jax
    fd, _ = make_case()
    leaves, treedef = jax.tree_util.tree_flatten(fd)
    fd2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(fd2.data, fd.data)
    assert fd2.labels == fd.labels


def test_jit_through_foam_data():
    import jax
    fd, raw = make_case()

    @jax.jit
    def f(x: FoamData):
        return x["internal"]["C"].sum()

    np.testing.assert_allclose(f(fd), raw[:4, :2].sum(), rtol=1e-5)
