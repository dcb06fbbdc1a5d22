"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_spatial=2)
    assert dict(mesh.shape) == {"data": 4, "spatial": 2}
    mesh = make_mesh()  # defaults to all devices on data
    assert dict(mesh.shape) == {"data": 8, "spatial": 1}


def test_sharded_batch_inference_matches_single():
    """pjit'd batched forward over the mesh == per-image results."""
    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.models import get_network
    from tfpose_tpu.ops.decode import decode
    from tfpose_tpu.pipeline.preprocess import normalize

    net = get_network("mobilenet_thin")
    h, w = 48, 48
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3)), train=False)
    params = DecodeParams()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, h, w, 3), np.uint8)

    def batched(variables, x):
        out = net.apply(variables, normalize(x),
                        train=False)["concat_stage7"]
        return jax.vmap(lambda t: decode(t, h // 8 * 2, w // 8 * 2,
                                         params))(out)

    mesh = make_mesh(n_data=8, n_spatial=1)
    with mesh:
        v_r = jax.device_put(variables, replicated(mesh))
        x_s = jax.device_put(jnp.asarray(imgs),
                             batch_sharding(mesh, None))
        sharded_out = jax.jit(batched)(v_r, x_s)
    single_out = jax.jit(batched)(variables, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(sharded_out.coords),
                               np.asarray(single_out.coords), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sharded_out.human_valid),
                                  np.asarray(single_out.human_valid))


def test_train_step_sharded_runs():
    from tfpose_tpu.models import get_network
    from tfpose_tpu.train.state import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    net = get_network("mobilenet_thin")
    h = w = 32
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3)), train=True)
    tx = make_optimizer()
    state = TrainState.create(variables, tx)
    step = make_train_step(net, tx)
    batch = {
        "image": jnp.zeros((8, h, w, 3)),
        "heat": jnp.zeros((8, h // 8, w // 8, 19)),
        "paf": jnp.zeros((8, h // 8, w // 8, 38)),
    }
    mesh = make_mesh(n_data=4, n_spatial=2)
    with mesh:
        state_r = jax.device_put(state, replicated(mesh))
        batch_s = shard_batch(mesh, batch, spatial_axis=None)
        new_state, metrics = jax.jit(step)(state_r, batch_s)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


def test_graft_entry_single():
    """__graft_entry__.entry must compile on one device."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.coords.shape[0] > 0
