"""CPM data transformer tests: label generation semantics (gaussians, PAF
corridors, background), augmentation geometry, and the end-to-end batch
stream feeding the CPM train graph."""

import numpy as np
import pytest

from caffe_rtpose_tpu.training.transformer import (
    AugParams,
    Meta,
    Person,
    generate_label_map,
    put_gaussian_maps,
    put_vec_maps,
    transform,
    transform_joints_coco,
)

cv2 = pytest.importorskip("cv2")


def _person(joints18, vis=None):
    joints = np.asarray(joints18, np.float32)
    v = np.zeros(18, np.int32) if vis is None else np.asarray(vis, np.int32)
    return Person(joints=joints, visible=v, objpos=joints.mean(0))


def test_put_gaussian_maps_peak_and_clamp():
    entry = np.zeros((46, 46), np.float32)
    put_gaussian_maps(entry, np.array([100.0, 100.0]), stride=8, sigma=7.0)
    # peak at grid position nearest (100-3.5)/8
    gy, gx = np.unravel_index(entry.argmax(), entry.shape)
    x = 8 / 2.0 - 0.5 + gx * 8
    y = 8 / 2.0 - 0.5 + gy * 8
    assert abs(x - 100) <= 4.0 and abs(y - 100) <= 4.0
    assert entry.max() <= 1.0
    # far-away cells skipped (exponent cutoff)
    assert entry[0, 45] == 0.0
    # double put clamps at 1
    put_gaussian_maps(entry, np.array([100.0, 100.0]), stride=8, sigma=7.0)
    assert entry.max() == 1.0


def test_put_vec_maps_direction_and_lastwriter():
    ex = np.zeros((46, 46), np.float32)
    ey = np.zeros((46, 46), np.float32)
    put_vec_maps(ex, ey, np.array([80.0, 100.0]), np.array([240.0, 100.0]))
    # horizontal limb: unit x vectors in the corridor
    assert ex[12, 20] == pytest.approx(1.0)
    assert ey[12, 20] == pytest.approx(0.0)
    assert ex[30, 20] == 0.0  # outside corridor
    # overlapping second limb overwrites (reference count bug, documented)
    put_vec_maps(ex, ey, np.array([160.0, 20.0]), np.array([160.0, 180.0]))
    assert ey[12, 20] == pytest.approx(1.0)
    assert ex[12, 20] == pytest.approx(0.0)


def test_transform_joints_coco_neck():
    j17 = np.zeros((17, 2), np.float32)
    v17 = np.zeros(17, np.int32)
    j17[5] = (10, 20)  # LShoulder
    j17[6] = (30, 40)  # RShoulder
    j, v = transform_joints_coco(j17, v17)
    # ours part 1 = neck = avg of coco 6,7 (1-indexed 6=LSho? mapping {1,6/7})
    np.testing.assert_allclose(j[1], [(10 + 30) / 2, (20 + 40) / 2])


def test_generate_label_map_layout():
    prm = AugParams(crop_size_x=368, crop_size_y=368)
    p = _person([[180 + 5 * i, 100 + 10 * i] for i in range(18)])
    meta = Meta(people=[p])
    label = generate_label_map(meta, prm, None)
    assert label.shape == (114, 46, 46)
    # weights all ones (no mask)
    np.testing.assert_allclose(label[:57], 1.0)
    # part channels have gaussians
    assert label[56 + 39].max() > 0.9  # nose channel (np+39)
    # PAF channels have unit vectors
    paf_mag = np.sqrt(label[57] ** 2 + label[58] ** 2)
    assert paf_mag.max() == pytest.approx(1.0, abs=1e-5)
    # background complements the parts
    parts_max = label[95:113].max(axis=0)
    np.testing.assert_allclose(label[113], np.maximum(1 - parts_max, 0), atol=1e-6)


def test_generate_label_weights_mask_and_absent():
    prm = AugParams()
    vis = np.zeros(18, np.int32)
    vis[4] = 3  # absent part
    p = _person([[100, 100]] * 18, vis)
    mask = np.full((46, 46), 128, np.uint8)
    meta = Meta(people=[p])
    label = generate_label_map(meta, prm, mask)
    assert label[0, 0, 0] == pytest.approx(128 / 255)
    assert np.all(label[4] == 0)  # absent part weight zeroed
    assert label[56, 0, 0] == pytest.approx(128 / 255)


def test_transform_end_to_end_shapes():
    rs = np.random.RandomState(0)
    img = (rs.rand(300, 400, 3) * 255).astype(np.uint8)
    p = _person([[200 + 5 * i, 150 + 3 * i] for i in range(18)])
    meta = Meta(people=[p], scale_self=0.8)
    prm = AugParams()
    data, label, aug = transform(img, meta, prm, rng=np.random.RandomState(1))
    assert data.shape == (3, 368, 368)
    assert label.shape == (114, 46, 46)
    assert -0.5 <= data.min() and data.max() <= 0.5
    # gaussians still present after augmentation
    assert label[95:113].max() > 0.5


def test_flip_swaps_left_right():
    img = np.zeros((100, 100, 3), np.uint8)
    joints = np.asarray([[10 + i, 50] for i in range(18)], np.float32)
    p = _person(joints)
    meta = Meta(people=[p], scale_self=AugParams().target_dist)  # scale 1
    prm = AugParams(scale_prob=0.0, max_rotate_degree=0.0,
                    center_perterb_max=0.0, flip_prob=1.1,
                    crop_size_x=100, crop_size_y=100)

    class FR(np.random.RandomState):
        pass

    rng = np.random.RandomState(3)
    data, label, aug = transform(img, meta, prm, rng=rng)
    assert aug.flip
    # croppad recenters on objpos (mean x 18.5 -> shift +32), then the flip
    # mirrors: RShoulder (2) holds mirrored LShoulder (5): 99 - (15+32) = 52
    assert meta.main.joints[2, 0] == pytest.approx(52, abs=1.0)
    # left/right symmetry: part 5 should mirror original part 2's position
    assert meta.main.joints[5, 0] == pytest.approx(99 - (12 + 32), abs=1.0)


def test_pose_batches_stream():
    from caffe_rtpose_tpu.training.datasets import SyntheticPoseSource, pose_batches, prefetch_loader

    src = SyntheticPoseSource(n=4, size=368)
    it = prefetch_loader(pose_batches(src, AugParams(), batch_size=2, seed=0))
    b = next(it)
    assert b["data"].shape == (2, 3, 368, 368)
    assert b["label"].shape == (2, 114, 46, 46)
    assert np.isfinite(b["data"]).all() and np.isfinite(b["label"]).all()


def test_cpm_train_graph_builds_and_losses():
    import jax.numpy as jnp

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.models.cpm import make_pose_train_net

    net_param = make_pose_train_net(batch=1, crop=64, stages=2)
    net = Net(net_param, phase="TRAIN", seed=0)
    tops = [t for t, w in net.loss_tops()]
    assert sorted(tops) == sorted(
        [f"loss_stage{s}_{b}" for s in (1, 2) for b in ("L1", "L2")]
    )
    rs = np.random.RandomState(0)
    data = rs.rand(1, 3, 64, 64).astype(np.float32) - 0.5
    label = rs.rand(1, 114, 8, 8).astype(np.float32)
    loss_fn = net.make_loss_fn()
    import jax

    from caffe_rtpose_tpu.ops import layout

    inputs = {"data": jnp.asarray(layout.to_physical(data)),
              "label": jnp.asarray(layout.to_physical(label))}
    loss = float(loss_fn(net.params, inputs, jax.random.PRNGKey(0)))
    assert np.isfinite(loss) and loss > 0
    # gradients flow
    g = jax.grad(loss_fn)(net.params, inputs, jax.random.PRNGKey(0))
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for v in g.values() for x in v)
    assert gnorm > 0


def test_deploy_builder_matches_reference_structure():
    import os

    from caffe_rtpose_tpu.models.cpm import make_pose_deploy_net
    from caffe_rtpose_tpu.proto import prototxt

    ours = make_pose_deploy_net("COCO", input_dim=(1, 3, 540, 960))
    ref_path = "/root/reference/model/coco/pose_deploy_linevec.prototxt"
    if not os.path.exists(ref_path):
        pytest.skip("reference not mounted")
    ref = prototxt.parse_file(ref_path)

    def sig(net):
        out = []
        for l in net["layer"]:
            cp = l.get("convolution_param", {})
            out.append((l["name"], l["type"], tuple(l.get("bottom", [])),
                        tuple(l.get("top", [])), cp.get("num_output"),
                        tuple(cp.get("kernel_size", [])), tuple(cp.get("pad", []))))
        return out

    assert sig(ours) == sig(ref)
