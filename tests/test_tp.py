"""Tensor (channel) parallelism — parallel/tp.py.

Channel-sharded weights over the virtual 8-device mesh must reproduce the
single-device results bit-for-bit-close (the placement changes only WHERE
slices live; XLA inserts the channel all-gathers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caffe_rtpose_tpu.parallel.dp import make_mesh
from caffe_rtpose_tpu.parallel.tp import (
    channel_spec, dryrun_tp, make_tp_forward, shard_params_channelwise)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def test_channel_spec_rules():
    mesh = make_mesh(8, axis="model")
    # HWIO conv kernel: O divides 8 -> sharded on the last axis
    w = jnp.zeros((3, 3, 16, 64))
    assert channel_spec(mesh, w).spec == jax.sharding.PartitionSpec(
        None, None, None, "model")
    # bias (1-D) and odd-width heads stay replicated
    assert channel_spec(mesh, jnp.zeros((64,))).spec == \
        jax.sharding.PartitionSpec()
    assert channel_spec(mesh, jnp.zeros((16, 19))).spec == \
        jax.sharding.PartitionSpec()


def test_tp_trunk_matches_single_device():
    dryrun_tp(8)  # asserts sharded forward == unsharded internally


def test_tp_params_are_actually_distributed():
    """Each device must hold 1/n of a sharded kernel (the HBM win is the
    point of the placement, not just numeric equality)."""
    mesh = make_mesh(8, axis="model")
    w = jnp.asarray(np.random.RandomState(0).rand(3, 3, 16, 64)
                    .astype(np.float32))
    with mesh:
        ws = jax.device_put(w, channel_spec(mesh, w))
    shard = ws.addressable_shards[0]
    assert shard.data.shape == (3, 3, 16, 8)
    # round-trips exactly
    np.testing.assert_array_equal(np.asarray(ws), np.asarray(w))


def test_tp_forward_mixed_sharded_replicated_params():
    """make_tp_forward reshards in-graph: passing UNsharded params through
    the wrapper must give the same answer (constraint does the placement)."""
    mesh = make_mesh(8, axis="model")

    def forward(params, x):
        w, b = params
        return jnp.einsum("bi,io->bo", x, w) + b

    rs = np.random.RandomState(3)
    params = (jnp.asarray(rs.rand(24, 32).astype(np.float32)),
              jnp.asarray(rs.rand(32).astype(np.float32)))
    x = jnp.asarray(rs.rand(4, 24).astype(np.float32))
    ref = forward(params, x)
    fn = make_tp_forward(mesh, forward)
    with mesh:
        out_unsharded_in = fn(params, x)
        out_presharded = fn(shard_params_channelwise(mesh, params), x)
    np.testing.assert_allclose(np.asarray(out_unsharded_in), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_presharded), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
