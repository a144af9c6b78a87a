"""Mesh/profiling utility tests on the fake 8-device CPU platform."""
import jax
import numpy as np
import pytest

from porous_cfd_tpu.parallel.mesh import initialize_distributed, make_mesh
from porous_cfd_tpu.utils.profiling import Timer, steps_per_sec, timed


def test_make_mesh_default_dp():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "points")
    assert mesh.shape["data"] == 8 and mesh.shape["points"] == 1


def test_make_mesh_points_axis():
    mesh = make_mesh(points=2)
    assert mesh.shape["data"] == 4 and mesh.shape["points"] == 2


def test_make_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(data=16, points=2)


def test_initialize_distributed_single_host_noop():
    initialize_distributed()  # must not raise


def test_mesh_runs_sharded_computation():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh()
    x = jax.device_put(jnp.arange(32.0).reshape(8, 4),
                       NamedSharding(mesh, P("data", None)))
    y = jax.jit(lambda a: (a * 2).sum())(x)
    np.testing.assert_allclose(float(y), np.arange(32.0).sum() * 2)


def test_timed_and_timer():
    import jax.numpy as jnp
    f = jax.jit(lambda x: x * 2 + 1)
    dt, out = timed(f, jnp.ones((8, 8)), n=3)
    assert dt > 0
    np.testing.assert_allclose(out, 3.0)
    t = Timer()
    t.start()
    t.stop(out)
    assert t.count == 1 and t.total > 0


def test_steps_per_sec():
    import jax.numpy as jnp

    @jax.jit
    def step(state):
        return state + 1, state.sum()

    rate, state = steps_per_sec(lambda s: step(s), jnp.zeros((4,)), n_steps=5)
    assert rate > 0
    np.testing.assert_allclose(state, 6.0)


def test_profiler_trace(tmp_path):
    """jax.profiler trace context produces artifacts."""
    import jax.numpy as jnp
    from porous_cfd_tpu.utils.profiling import trace
    with trace(str(tmp_path)):
        _ = jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    assert list(tmp_path.rglob("*.pb")) or list(tmp_path.rglob("*.json*")) \
        or list(tmp_path.rglob("*.trace*")) or list(tmp_path.iterdir())
