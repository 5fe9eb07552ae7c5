"""Eval harness (joint-diff, OKS AP), DevicePool frame parallelism on the
8-device CPU mesh, and HDF5 weight snapshots."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF_COCO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


def _write_json(path, bodies):
    data = {"version": 0.1, "bodies": [{"joints": b} for b in bodies]}
    with open(path, "w") as f:
        json.dump(data, f)


def test_joint_diff_parity_ok(tmp_path, capsys):
    from caffe_rtpose_tpu.tools.eval_pose import main

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    joints = [10.0, 20.0, 0.9, 30.0, 40.0, 0.8]
    _write_json(a / "f.json", [joints])
    jb = list(joints)
    jb[0] += 0.5  # within 1px
    _write_json(b / "f.json", [jb])
    assert main(["joint-diff", str(a), str(b)]) == 0
    assert "PARITY OK" in capsys.readouterr().out


def test_joint_diff_parity_fail(tmp_path, capsys):
    from caffe_rtpose_tpu.tools.eval_pose import main

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    _write_json(a / "f.json", [[10.0, 20.0, 0.9]])
    _write_json(b / "f.json", [[15.0, 20.0, 0.9]])
    assert main(["joint-diff", str(a), str(b)]) == 2
    assert "PARITY FAIL" in capsys.readouterr().out


def test_oks_ap_perfect_predictions():
    from caffe_rtpose_tpu.tools.eval_pose import coco_keypoint_ap

    rs = np.random.RandomState(0)
    gts, dts = {}, {}
    for img in range(3):
        kps = []
        for _ in range(2):
            kp = np.zeros((17, 3), np.float32)
            kp[:, 0] = rs.uniform(50, 400, 17)
            kp[:, 1] = rs.uniform(50, 400, 17)
            kp[:, 2] = 2
            kps.append({"keypoints": kp, "area": 10000.0})
        gts[img] = kps
        dts[img] = [{"keypoints": k["keypoints"].copy(), "score": 1.0} for k in kps]
    res = coco_keypoint_ap(gts, dts)
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)
    # corrupt predictions -> AP drops
    for img in dts:
        for d in dts[img]:
            d["keypoints"][:, :2] += 200
    res2 = coco_keypoint_ap(gts, dts)
    assert res2["AP"] < 0.2


@pytest.mark.skipif(not os.path.exists(REF_COCO), reason="reference not mounted")
def test_device_pool_round_robin_matches_single():
    import jax

    from caffe_rtpose_tpu.parallel.inference import DevicePool
    from caffe_rtpose_tpu.pose.estimator import PoseEstimator

    est = PoseEstimator(REF_COCO, net_resolution=(64, 48), seed=5, input_u8=True)
    pool = DevicePool(est, num_devices=min(4, len(jax.devices())))
    rs = np.random.RandomState(0)
    x = (rs.rand(1, 48, 64, 3) * 255).astype(np.uint8)
    ref = est.fetch(est.run_device(x, nms_threshold=-1.0))
    outs = [pool.run_device(x, nms_threshold=-1.0) for _ in range(4)]
    for o in outs:
        got = pool.fetch(o)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_hdf5_weight_roundtrip(tmp_path):
    from caffe_rtpose_tpu.core.net import Net

    text = """
    input: "x" input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
    layer { name: "c" type: "Convolution" bottom: "x" top: "y"
      convolution_param { num_output: 2 kernel_size: 3 pad: 1
        weight_filler { type: "gaussian" std: 0.2 } } }
    """
    net = Net(text, seed=1)
    p = str(tmp_path / "w.h5")
    net.save_hdf5(p)
    net2 = Net(text, seed=77)
    assert net2.load_hdf5(p) == 1
    x = np.random.RandomState(0).randn(1, 3, 8, 8).astype(np.float32)
    np.testing.assert_allclose(net.forward(x=x)["y"], net2.forward(x=x)["y"], rtol=1e-5)


def test_run_list_parser():
    from caffe_rtpose_tpu.tools.eval_pose import parse_image_list

    ref = "/root/reference/image_info_val2014_1k.txt"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    entries = parse_image_list(ref)
    assert len(entries) == 1160
    assert entries[0] == (136, "COCO_val2014_000000000136.jpg", 374, 500)


class TestSpatialEstimator:
    def test_h_sharded_estimator_matches_single_device(self):
        """The full fused pose program (CNN + upsample + NMS + PAF scoring)
        sharded over H across the 8-device mesh must match the unsharded
        run exactly (SURVEY section 7 item 5: spatial headroom path)."""
        import jax
        import numpy as np

        from caffe_rtpose_tpu.parallel.dp import make_mesh
        from caffe_rtpose_tpu.parallel.sp import spatial_estimator_fn
        from caffe_rtpose_tpu.pose.estimator import PoseEstimator

        est = PoseEstimator(
            "/root/reference/model/coco/pose_deploy_linevec.prototxt",
            net_resolution=(128, 128), seed=4, input_u8=True)
        rs = np.random.RandomState(0)
        x = (rs.rand(1, 128, 128, 3) * 255).astype(np.uint8)
        ref = est.fetch(est.run_device(x, nms_threshold=-1.0))

        mesh = make_mesh(8, axis="spatial")
        import jax.numpy as jnp

        fn = spatial_estimator_fn(mesh, est)
        with mesh:
            out = fn(est.net.params, jnp.asarray(x),
                     jnp.float32(-1.0), jnp.float32(est.params_connect.inter_threshold))
        got = est.unpack(np.asarray(jax.device_get(out["packed"])))
        np.testing.assert_array_equal(got[0][:, 0, 0], ref[0][:, 0, 0])
        np.testing.assert_allclose(got[0], ref[0], atol=2e-3)
        np.testing.assert_allclose(got[1], ref[1], atol=2e-2)


class TestComposedMesh2D:
    def test_dp_sp_train_step_matches_single_device(self):
        """Composed 4x2 data x spatial mesh: one train step of the full
        CPM train topology (reduced stages/crop for suite time) agrees
        with the single-device step — loss and updated params."""
        from caffe_rtpose_tpu.parallel.mesh2d import dryrun_dp_sp_train

        dryrun_dp_sp_train(8, crop=48, batch=4, spatial=2, stages=2)

    def test_mesh2d_shapes_and_sharding(self):
        """Axis layout and input placement of the 2-axis mesh."""
        import jax
        from jax.sharding import PartitionSpec as P

        from caffe_rtpose_tpu.parallel.mesh2d import (make_mesh2d,
                                                      shard_batch_2d)

        mesh = make_mesh2d(8, spatial=2)
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "spatial")
        batch = {
            "data": np.zeros((4, 16, 16, 3), np.float32),
            "label": np.zeros((4, 8, 8, 10), np.float32),
            "scalar_w": np.float32(1.0),
        }
        placed = shard_batch_2d(mesh, batch)
        assert placed["data"].sharding.spec == P("data", "spatial", None, None)
        assert placed["label"].sharding.spec == P("data", "spatial", None, None)
        assert placed["scalar_w"].sharding.spec == P()

        # odd H cannot split evenly over spatial -> data-only fallback
        odd = shard_batch_2d(mesh, {"x": np.zeros((4, 23, 16, 3), np.float32)})
        assert odd["x"].sharding.spec == P("data")

        # batch 10 does not divide the 4-way data axis (the CPM flagship
        # batch size): the batch dim replicates instead of raising, the H
        # shard is kept (round-3 advisor finding)
        b10 = shard_batch_2d(mesh, {"x": np.zeros((10, 16, 16, 3), np.float32)})
        assert b10["x"].sharding.spec == P(None, "spatial", None, None)

        # nhwc_keys restricts spatial sharding to physical-NHWC arrays: a
        # caffe-NCHW array whose channel count divides the spatial axis
        # must NOT get dim 1 sharded
        nchw = shard_batch_2d(
            mesh,
            {"img": np.zeros((4, 16, 16, 3), np.float32),
             "raw": np.zeros((4, 4, 16, 16), np.float32)},
            nhwc_keys={"img"},
        )
        assert nchw["img"].sharding.spec == P("data", "spatial", None, None)
        assert nchw["raw"].sharding.spec == P("data")

        with pytest.raises(ValueError):
            make_mesh2d(8, spatial=3)

    def test_dp_tp_batched_estimator_matches_single_device(self):
        """Composed data x model mesh for serving: a 4-frame batch sharded
        over `data` with every conv/FC weight channel-sharded over `model`
        (each replica group holds half the weights) must reproduce the
        single-device batched program frame-for-frame."""
        import jax
        import jax.numpy as jnp

        from caffe_rtpose_tpu.models.cpm import make_pose_deploy_net
        from caffe_rtpose_tpu.parallel.mesh2d import (dp_tp_estimator_fn,
                                                      make_mesh2d)
        from caffe_rtpose_tpu.parallel.tp import shard_params_channelwise
        from caffe_rtpose_tpu.pose.estimator import PoseEstimator

        proto = make_pose_deploy_net("COCO", input_dim=(1, 3, 80, 128))
        est = PoseEstimator(proto, net_resolution=(128, 80), num_scales=1,
                            seed=5, batch=4, input_u8=True)
        rs = np.random.RandomState(6)
        x = (rs.rand(4, 1, 80, 128, 3) * 255).astype(np.uint8)
        single = est.fetch_batch(est.run_device(x))

        mesh = make_mesh2d(8, spatial=2, axes=("data", "model"))
        fn = dp_tp_estimator_fn(mesh, est)
        p = est.params_connect
        xp = jnp.asarray(x)
        with mesh:
            params = shard_params_channelwise(mesh, est.net.params)
            out = fn(params, xp, jnp.float32(p.nms_threshold),
                     jnp.float32(p.inter_threshold))
        sharded = est.fetch_batch(out)
        assert len(sharded) == len(single) == 4
        for (pk_s, sc_s, ct_s), (pk_r, sc_r, ct_r) in zip(sharded, single):
            np.testing.assert_allclose(pk_s, pk_r, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(sc_s, sc_r, rtol=2e-2, atol=2e-2)
            np.testing.assert_array_equal(ct_s, ct_r)


def test_multihost_dp_dryrun():
    """SURVEY §7.6 multi-host data parallelism: the SAME make_dp_train_step
    on the 6-stage CPM graph, split over 2 OS processes x 2 virtual CPU
    devices each (jax.distributed + cross-process Gloo collectives standing
    in for DCN), == the 1-process x 4-device step on the identical global
    batch.  Runs entirely in fresh subprocesses (parallel/multihost.py);
    this process's jax state is untouched."""
    from caffe_rtpose_tpu.parallel.multihost import dryrun_multihost

    dryrun_multihost(num_processes=2, devices_per_process=2,
                     crop=48, batch=4)
