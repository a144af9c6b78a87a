"""Native parser (runtime/foamio.cpp) tests: correctness vs the pure-Python
path, comment/identifier skipping, threaded multi-file parsing, and a
throughput sanity check."""
import time

import numpy as np
import pytest

from porous_cfd_tpu.data import foam_io, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native foamio library not built")


def test_parse_floats_basic():
    out = native.parse_floats("( (1 2 3) (4.5 -6e-2 7) )")
    np.testing.assert_allclose(out, [1, 2, 3, 4.5, -0.06, 7])


def test_parse_floats_skips_comments_and_words():
    text = """// comment with numbers 123
    /* block 456 */
    grad2 patch_walls List<vector>
    ( 1.5 2.5 )
    """
    np.testing.assert_allclose(native.parse_floats(text), [1.5, 2.5])


def test_parse_file_skips_header(tmp_path):
    vals = np.random.default_rng(0).normal(size=(20, 3))
    foam_io.write_list_file(tmp_path / "faceCentres", "faceCentres", vals)
    out = native.parse_file(tmp_path / "faceCentres")
    # first float is the count line, then the data
    assert out[0] == 20
    np.testing.assert_allclose(out[1:].reshape(20, 3), vals)


def test_field_file_native_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    vals = rng.normal(size=(500, 3))
    foam_io.write_field_file(tmp_path / "U", "volVectorField", "U", vals)
    rd = foam_io.read_field_file(tmp_path / "U")
    np.testing.assert_allclose(rd["internal"], vals)

    # force the pure-python path and compare
    body = "(" + "".join(f"({v[0]} {v[1]} {v[2]})" for v in vals) + ")"
    pure = np.fromstring(body.replace("(", " ").replace(")", " "), sep=" ")
    nat = native.parse_floats(body)
    np.testing.assert_allclose(nat, pure)


def test_parse_files_threaded(tmp_path):
    rng = np.random.default_rng(2)
    paths, expected = [], []
    for i in range(12):
        v = rng.normal(size=(50,))
        foam_io.write_postprocess_field(tmp_path / f"f{i}", v)
        paths.append(tmp_path / f"f{i}")
        expected.append(v)
    outs = native.parse_files(paths, n_threads=4)
    assert outs is not None
    for out, exp in zip(outs, expected):
        # first float is the count
        assert out[0] == 50
        np.testing.assert_allclose(out[1:], exp)


def test_native_speedup(tmp_path):
    """The native path should beat replace+fromstring on a large block."""
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(200_000, 3))
    body = "(\n" + "\n".join(
        f"({float(v[0])!r} {float(v[1])!r} {float(v[2])!r})" for v in vals) + "\n)"

    t0 = time.perf_counter()
    pure = np.fromstring(body.replace("(", " ").replace(")", " "), sep=" ")
    t_pure = time.perf_counter() - t0

    t0 = time.perf_counter()
    nat = native.parse_floats(body)
    t_native = time.perf_counter() - t0

    np.testing.assert_allclose(nat, pure)
    # don't be flaky about the exact ratio; just require it's not slower
    assert t_native < t_pure * 1.5, (t_native, t_pure)
    print(f"native {t_native * 1e3:.1f}ms vs pure {t_pure * 1e3:.1f}ms")
