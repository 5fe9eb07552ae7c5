"""Device label rasterizer vs the host reference implementation."""

import numpy as np

from caffe_rtpose_tpu.training.labels_device import make_label_fn, make_input_transform
from caffe_rtpose_tpu.training.transformer import AugParams, Meta, Person, generate_label_map


def _random_people(rs, n_people, absent_frac=0.2):
    people = []
    for _ in range(n_people):
        joints = rs.uniform(-20, 380, size=(18, 2)).astype(np.float32)
        vis = rs.choice([0, 1, 2, 3], size=18,
                        p=[0.5, 0.2, 0.1, 0.2]).astype(np.int32)
        people.append(Person(joints=joints, visible=vis,
                             objpos=joints.mean(0)))
    return people


class TestDeviceLabels:
    def test_matches_host_reference(self):
        prm = AugParams()
        rs = np.random.RandomState(0)
        max_people = 5
        B = 3
        gy, gx = prm.crop_size_y // prm.stride, prm.crop_size_x // prm.stride

        joints = np.zeros((B, max_people, 18, 2), np.float32)
        vis = np.full((B, max_people, 18), 3, np.int32)
        weight = rs.rand(B, gy, gx).astype(np.float32)
        host_labels = []
        for b in range(B):
            people = _random_people(rs, 2 + b)
            for pi, p in enumerate(people):
                joints[b, pi] = p.joints
                vis[b, pi] = p.visible
            meta = Meta(people=people, scale_self=1.0)
            host_labels.append(
                generate_label_map(meta, prm, (weight[b] * 255.0)))
        host = np.stack(host_labels)  # (B, 114, gy, gx)

        label_fn = make_label_fn(prm, max_people)
        dev = np.asarray(label_fn(joints, vis, weight))  # (B, gy, gx, 114)
        dev_chw = np.transpose(dev, (0, 3, 1, 2))

        assert dev_chw.shape == host.shape
        # split by channel family for diagnosable failures
        np_ = prm.np
        np.testing.assert_allclose(dev_chw[:, : np_ + 1], host[:, : np_ + 1],
                                   atol=1e-5, err_msg="weight channels")
        np.testing.assert_allclose(dev_chw[:, np_ + 1 : np_ + 39],
                                   host[:, np_ + 1 : np_ + 39],
                                   atol=1e-5, err_msg="PAF channels")
        np.testing.assert_allclose(dev_chw[:, np_ + 39 : np_ + 57],
                                   host[:, np_ + 39 : np_ + 57],
                                   atol=1e-5, err_msg="gaussian channels")
        np.testing.assert_allclose(dev_chw[:, -1], host[:, -1],
                                   atol=1e-5, err_msg="background")

    def test_input_transform_shapes(self):
        prm = AugParams()
        tf = make_input_transform(prm, max_people=4)
        gy, gx = prm.crop_size_y // prm.stride, prm.crop_size_x // prm.stride
        import jax.numpy as jnp

        out = tf({
            "data": jnp.zeros((2, prm.crop_size_y, prm.crop_size_x, 3)),
            "joints": jnp.zeros((2, 4, 18, 2)),
            "vis": jnp.full((2, 4, 18), 3, jnp.int32),
            "weight": jnp.ones((2, gy, gx)),
        })
        assert set(out) == {"data", "label"}
        assert out["label"].shape == (2, gy, gx, 2 * (prm.np + 1))


class TestJointfeedPipeline:
    def test_solver_with_device_labels(self):
        """End-to-end: synthetic source -> jointfeed batches -> device label
        rasterization fused into the train step of the CPM train graph."""
        import jax.numpy as jnp

        from caffe_rtpose_tpu.core.net import Net
        from caffe_rtpose_tpu.models.cpm import make_pose_train_net
        from caffe_rtpose_tpu.training.datasets import SyntheticPoseSource
        from caffe_rtpose_tpu.training.labels_device import pose_batches_jointfeed
        from caffe_rtpose_tpu.training.solver import Solver

        prm = AugParams(crop_size_x=64, crop_size_y=64)
        net_param = make_pose_train_net(batch=2, crop=64, stages=1)
        net = Net(net_param, phase="TRAIN", dtype=jnp.float32)
        it = pose_batches_jointfeed(SyntheticPoseSource(n=4, size=96), prm,
                                    batch_size=2, max_people=4)
        solver = Solver(
            "base_lr: 0.0001 momentum: 0.9 lr_policy: 'fixed' max_iter: 2",
            net, lambda _: next(it),
            input_transform=make_input_transform(prm, max_people=4),
        )
        l0 = solver.step(1)
        l1 = solver.step(1)
        assert np.isfinite(l0) and np.isfinite(l1)


class TestU8Jointfeed:
    def test_u8_matches_f32_path(self):
        """data_u8 ships raw u8; on-device (x-128)/256 must equal the host
        normalize exactly (u8 values are exact in f32)."""
        import jax.numpy as jnp

        from caffe_rtpose_tpu.training.datasets import SyntheticPoseSource
        from caffe_rtpose_tpu.training.labels_device import (
            make_input_transform, pose_batches_jointfeed)

        prm = AugParams(crop_size_x=64, crop_size_y=64)
        src = SyntheticPoseSource(n=3, size=96)
        it_f = pose_batches_jointfeed(src, prm, batch_size=2, max_people=4,
                                      seed=5, data_u8=False)
        it_u = pose_batches_jointfeed(src, prm, batch_size=2, max_people=4,
                                      seed=5, data_u8=True)
        bf, bu = next(it_f), next(it_u)
        assert bu["data"].dtype == np.uint8
        tf = make_input_transform(prm, max_people=4, data_u8=True)
        out = tf({k: jnp.asarray(v) for k, v in bu.items()})
        np.testing.assert_allclose(np.asarray(out["data"]), bf["data"],
                                   atol=1e-6)
