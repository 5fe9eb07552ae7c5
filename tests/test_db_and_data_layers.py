"""DB abstraction (utils.db), Datum codec, and the host data-layer family."""

import os

import numpy as np
import pytest

from caffe_rtpose_tpu.proto import datum as datum_io
from caffe_rtpose_tpu.utils import db as dbmod


def _fill(path, items):
    d = dbmod.open_db(path, "w", backend="kvdb")
    txn = d.new_transaction()
    for k, v in items:
        txn.put(k, v)
    txn.commit()
    d.close()


class TestKvdb:
    def test_roundtrip_sorted(self, tmp_path):
        path = str(tmp_path / "test.kvdb")
        _fill(path, [(b"b", b"2"), (b"a", b"1"), (b"c", b"3")])
        with dbmod.open_db(path, "r") as d:
            assert len(d) == 3
            cur = d.new_cursor()
            cur.seek_to_first()
            seen = []
            while cur.valid():
                seen.append((cur.key(), cur.value()))
                cur.next()
            assert seen == [(b"a", b"1"), (b"b", b"2"), (b"c", b"3")]
            assert d.get(b"b") == b"2"
            assert d.get(b"zz") is None

    def test_overwrite_and_append(self, tmp_path):
        path = str(tmp_path / "test.kvdb")
        _fill(path, [(b"k1", b"old"), (b"k2", b"x")])
        d = dbmod.open_db(path, "w")
        txn = d.new_transaction()
        txn.put(b"k1", b"new")
        txn.put(b"k0", b"y")
        txn.commit()
        assert len(d) == 3
        assert d.get(b"k1") == b"new"
        cur = d.new_cursor()
        cur.seek_to_first()
        assert cur.key() == b"k0"
        d.close()

    def test_python_and_native_formats_interop(self, tmp_path):
        """The C++ and Python implementations read each other's files."""
        from caffe_rtpose_tpu import native

        items = [(f"k{i:03d}".encode(), os.urandom(50)) for i in range(20)]
        py_path = str(tmp_path / "py.kvdb")
        imp = dbmod._PyKvdb(py_path, True)
        for k, v in items:
            imp.put(k, v)
        imp.commit()
        imp.close()

        lib = native.load_lib("kvdb")
        if lib is None:
            pytest.skip("no native toolchain")
        nat = dbmod._NativeKvdb(lib, py_path, False)
        assert nat.count() == 20
        assert nat.at(0) == items[0]
        assert nat.find(b"k007") == 7
        nat.close()

        nat_path = str(tmp_path / "nat.kvdb")
        nat = dbmod._NativeKvdb(lib, nat_path, True)
        for k, v in items:
            nat.put(k, v)
        nat.commit()
        nat.close()
        imp = dbmod._PyKvdb(nat_path, False)
        assert imp.count() == 20
        assert imp.at(3) == items[3]
        imp.close()

    def test_lmdb_backend_gated(self, tmp_path):
        with pytest.raises(ImportError):
            dbmod.open_db(str(tmp_path / "x"), "w", backend="lmdb")


class TestDatum:
    def test_u8_roundtrip(self):
        arr = (np.arange(2 * 4 * 5) % 256).astype(np.uint8).reshape(2, 4, 5)
        d = datum_io.array_to_datum(arr, label=7)
        buf = datum_io.serialize_datum(d)
        back = datum_io.parse_datum(buf)
        assert back["label"] == 7
        np.testing.assert_array_equal(datum_io.datum_to_array(back), arr)

    def test_float_roundtrip(self):
        arr = np.random.RandomState(0).randn(3, 2, 2).astype(np.float32)
        back = datum_io.parse_datum(datum_io.serialize_datum(datum_io.array_to_datum(arr)))
        np.testing.assert_allclose(datum_io.datum_to_array(back), arr, rtol=1e-6)

    def test_encoded_image(self):
        img = (np.random.RandomState(1).rand(8, 6, 3) * 255).astype(np.uint8)
        d = datum_io.image_to_datum(img, label=2, encode_fmt="png")
        assert d["encoded"]
        back = datum_io.datum_to_image(datum_io.parse_datum(datum_io.serialize_datum(d)))
        np.testing.assert_array_equal(back, img)  # png is lossless


def _write_datum_db(path, n=8, c=3, h=6, w=5):
    rs = np.random.RandomState(0)
    d = dbmod.open_db(path, "w", backend="kvdb")
    txn = d.new_transaction()
    arrays = []
    for i in range(n):
        arr = (rs.rand(c, h, w) * 255).astype(np.uint8)
        arrays.append(arr)
        txn.put(f"{i:08d}", datum_io.serialize_datum(datum_io.array_to_datum(arr, label=i)))
    txn.commit()
    d.close()
    return arrays


class TestDataLayers:
    def test_data_layer_in_net(self, tmp_path):
        from caffe_rtpose_tpu.core.net import Net

        path = str(tmp_path / "train.kvdb")
        arrays = _write_datum_db(path)
        proto = {
            "name": "dbnet",
            "layer": [
                {"name": "data", "type": "Data", "top": ["data", "label"],
                 "data_param": {"source": path, "batch_size": 4},
                 "transform_param": {"scale": 0.5}},
                {"name": "pool", "type": "Pooling", "bottom": ["data"], "top": ["pooled"],
                 "pooling_param": {"kernel_size": 2, "stride": 2}},
            ],
        }
        net = Net(proto, phase="TEST")
        out = net.forward({}, outputs=["pooled", "label"])
        # caffe ceil-mode pooling: 6x5 / k2 s2 -> 3x3
        assert out["pooled"].shape == (4, 3, 3, 3)
        np.testing.assert_array_equal(out["label"], [0, 1, 2, 3])
        # first record (sequential cursor), scaled by 0.5
        first = arrays[0].astype(np.float32) * 0.5
        out2 = net.forward({}, outputs=["data"])
        # second forward advances the cursor
        np.testing.assert_allclose(out2["data"][0], arrays[4].astype(np.float32) * 0.5,
                                   rtol=1e-5)
        _ = first

    def test_memory_data_layer(self):
        from caffe_rtpose_tpu.core.net import Net

        proto = {
            "name": "mem",
            "layer": [
                {"name": "data", "type": "MemoryData", "top": ["data", "label"],
                 "memory_data_param": {"batch_size": 2, "channels": 1,
                                       "height": 3, "width": 3}},
                {"name": "sm", "type": "AbsVal", "bottom": ["data"], "top": ["out"]},
            ],
        }
        net = Net(proto, phase="TEST")
        data = np.arange(4 * 1 * 3 * 3, dtype=np.float32).reshape(4, 1, 3, 3) - 10
        labels = np.array([5, 6, 7, 8], np.float32)
        net.set_input_arrays(data, labels)
        o1 = net.forward({}, outputs=["out", "label"])
        np.testing.assert_allclose(o1["out"], np.abs(data[:2]), rtol=1e-6)
        np.testing.assert_array_equal(o1["label"], [5, 6])
        o2 = net.forward({}, outputs=["label"])
        np.testing.assert_array_equal(o2["label"], [7, 8])

    def test_image_data_layer(self, tmp_path):
        import cv2

        from caffe_rtpose_tpu.core.net import Net

        rs = np.random.RandomState(0)
        names = []
        for i in range(3):
            img = (rs.rand(10, 12, 3) * 255).astype(np.uint8)
            name = f"img{i}.png"
            cv2.imwrite(str(tmp_path / name), img)
            names.append(name)
        listfile = tmp_path / "list.txt"
        listfile.write_text("".join(f"{n} {i}\n" for i, n in enumerate(names)))
        proto = {
            "name": "imgs",
            "layer": [
                {"name": "data", "type": "ImageData", "top": ["data", "label"],
                 "image_data_param": {"source": str(listfile), "batch_size": 2,
                                      "root_folder": str(tmp_path) + "/",
                                      "new_height": 8, "new_width": 8}},
            ],
        }
        net = Net(proto, phase="TEST")
        out = net.forward({}, outputs=["data", "label"])
        assert out["data"].shape == (2, 3, 8, 8)
        np.testing.assert_array_equal(out["label"], [0, 1])

    def test_hdf5_data_layer(self, tmp_path):
        import h5py

        from caffe_rtpose_tpu.core.net import Net

        h5 = tmp_path / "d.h5"
        rs = np.random.RandomState(0)
        X = rs.rand(6, 2, 4, 4).astype(np.float32)
        y = np.arange(6, dtype=np.float32)
        with h5py.File(h5, "w") as f:
            f["data"] = X
            f["label"] = y
        lst = tmp_path / "files.txt"
        lst.write_text(str(h5) + "\n")
        proto = {
            "name": "h5net",
            "layer": [
                {"name": "data", "type": "HDF5Data", "top": ["data", "label"],
                 "hdf5_data_param": {"source": str(lst), "batch_size": 3}},
            ],
        }
        net = Net(proto, phase="TEST")
        out = net.forward({}, outputs=["data", "label"])
        np.testing.assert_allclose(out["data"], X[:3], rtol=1e-6)
        np.testing.assert_array_equal(out["label"], y[:3])

    def test_window_data_layer(self, tmp_path):
        import cv2

        from caffe_rtpose_tpu.core.data_layers import WindowDataLayer
        from caffe_rtpose_tpu.proto import caffe_pb

        img = (np.random.RandomState(0).rand(40, 50, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "a.png"), img)
        wf = tmp_path / "win.txt"
        wf.write_text(
            "# 0\n"
            f"{tmp_path}/a.png\n"
            "3 40 50\n"
            "2\n"
            "1 0.9 5 5 30 30\n"
            "0 0.1 0 0 10 10\n"
        )
        lv = caffe_pb.view({
            "name": "w", "type": "WindowData", "top": ["data", "label"],
            "window_data_param": {"source": str(wf), "batch_size": 4,
                                  "crop_size": 16, "fg_fraction": 0.5,
                                  "context_pad": 2},
        }, "LayerParameter")
        dl = WindowDataLayer(lv, "TRAIN")
        batch = dl.next_batch()
        assert batch["data"].shape == (4, 3, 16, 16)
        # first half fg (label 1), rest bg (label 0)
        np.testing.assert_array_equal(batch["label"][:2], [1, 1])
        np.testing.assert_array_equal(batch["label"][2:], [0, 0])


class TestAuxToolsDb:
    def test_convert_imageset_kvdb_and_mean(self, tmp_path):
        import cv2

        from caffe_rtpose_tpu.core.data_layers import read_mean_binaryproto
        from caffe_rtpose_tpu.tools.aux_tools import compute_image_mean, convert_imageset

        rs = np.random.RandomState(0)
        for i in range(3):
            cv2.imwrite(str(tmp_path / f"i{i}.png"),
                        (rs.rand(6, 6, 3) * 255).astype(np.uint8))
        lst = tmp_path / "list.txt"
        lst.write_text("".join(f"i{i}.png {i}\n" for i in range(3)))
        dbp = str(tmp_path / "imgs.kvdb")
        convert_imageset(str(lst), str(tmp_path), dbp)
        with dbmod.open_db(dbp, "r") as d:
            assert len(d) == 3
            cur = d.new_cursor()
            cur.seek_to_first()
            rec = datum_io.parse_datum(cur.value())
            assert (rec["channels"], rec["height"], rec["width"]) == (3, 6, 6)
        mp = str(tmp_path / "mean.binaryproto")
        mean = compute_image_mean(dbp, mp)
        assert mean.shape == (3, 6, 6)
        np.testing.assert_allclose(read_mean_binaryproto(mp), mean, rtol=1e-6)


class TestPoseDb:
    def test_roundtrip_and_training_feed(self, tmp_path):
        import cv2
        import json as _json

        from caffe_rtpose_tpu.training.datasets import pose_batches
        from caffe_rtpose_tpu.training.pose_db import PoseDbSource, build_pose_db
        from caffe_rtpose_tpu.training.transformer import AugParams

        rs = np.random.RandomState(0)
        idx = []
        for i in range(3):
            img = (rs.rand(60, 80, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / f"p{i}.png"), img)
            joints = rs.uniform(5, 55, (18, 3)).astype(float)
            joints[:, 2] = 1
            idx.append({"image": f"p{i}.png", "scale_self": 0.7,
                        "objpos": [40, 30], "joints": joints.tolist()})
        (tmp_path / "index.json").write_text(_json.dumps(idx))
        mask = np.full((60, 80), 255, np.uint8)
        cv2.imwrite(str(tmp_path / "m.png"), mask)
        idx[1]["mask"] = "m.png"
        (tmp_path / "index.json").write_text(_json.dumps(idx))

        dbp = str(tmp_path / "pose.kvdb")
        n = build_pose_db(str(tmp_path / "index.json"), dbp)
        assert n == 3
        src = PoseDbSource(dbp)
        assert len(src) == 3
        img1, meta1, mask1 = src[1]
        assert img1.shape == (60, 80, 3)
        assert len(meta1.people) == 1
        assert meta1.people[0].joints.shape == (18, 2)
        assert mask1 is not None and mask1.shape == (60, 80)
        # lossless: PNG roundtrip of the image
        orig = cv2.imread(str(tmp_path / "p1.png"))
        np.testing.assert_array_equal(img1, orig)
        # feeds the training transformer end-to-end
        prm = AugParams(crop_size_x=48, crop_size_y=48)
        batch = next(pose_batches(src, prm, batch_size=2))
        assert batch["data"].shape == (2, 3, 48, 48)
        assert np.isfinite(batch["label"]).all()


class TestReviewRegressions:
    def test_native_in_txn_duplicate_key_last_wins(self, tmp_path):
        """Duplicate puts within ONE transaction: last write wins in both
        backends (review finding: the native dedup used to be dead code)."""
        from caffe_rtpose_tpu import native

        for opener in ("native", "python"):
            path = str(tmp_path / f"{opener}.kvdb")
            if opener == "native":
                lib = native.load_lib("kvdb")
                if lib is None:
                    pytest.skip("no native toolchain")
                imp = dbmod._NativeKvdb(lib, path, True)
            else:
                imp = dbmod._PyKvdb(path, True)
            imp.put(b"a", b"first")
            imp.put(b"a", b"second")
            imp.put(b"b", b"x")
            imp.commit()
            assert imp.count() == 2, opener
            assert imp.at(imp.find(b"a"))[1] == b"second", opener
            imp.close()

    def test_convert_imageset_encoded_defaults_to_png(self, tmp_path):
        import cv2

        from caffe_rtpose_tpu.tools.aux_tools import convert_imageset

        img = (np.random.RandomState(0).rand(6, 6, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "a.png"), img)
        (tmp_path / "l.txt").write_text("a.png 0\n")
        dbp = str(tmp_path / "enc.kvdb")
        convert_imageset(str(tmp_path / "l.txt"), str(tmp_path), dbp, encoded=True)
        with dbmod.open_db(dbp, "r") as d:
            cur = d.new_cursor()
            cur.seek_to_first()
            rec = datum_io.parse_datum(cur.value())
            assert rec.get("encoded"), "encoded flag must be set"
            np.testing.assert_array_equal(datum_io.datum_to_image(rec), img)

    def test_test_phase_mirror_applies(self):
        from caffe_rtpose_tpu.core.data_layers import StandardTransformer
        from caffe_rtpose_tpu.proto import caffe_pb

        tp = caffe_pb.view({"mirror": True}, "TransformationParameter")
        tf = StandardTransformer(tp, "TEST")
        x = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
        rs = np.random.RandomState(0)
        outs = {tf(x, rs).tobytes() for _ in range(16)}
        assert len(outs) == 2, "mirror must fire in TEST phase too"

    def test_cpm_data_layer_shapes(self, tmp_path):
        """CPMData is a real graph data layer now (was a guidance guard):
        tops get the transform_param-derived static shapes."""
        from caffe_rtpose_tpu.core.net import Net
        from caffe_rtpose_tpu.training.cpm_lmdb import (
            RecordInfo, encode_cpm_datum, write_cpm_db)
        from caffe_rtpose_tpu.training.transformer import Meta, Person

        rng = np.random.RandomState(0)
        joints = np.stack([rng.uniform(8, 90, 17),
                           rng.uniform(8, 70, 17)], 1).astype(np.float32)
        meta = Meta(people=[Person(joints=joints,
                                   visible=np.ones(17, np.int32),
                                   objpos=np.array([50, 40], np.float32))],
                    scale_self=0.8)
        img = rng.randint(0, 256, (80, 100, 3), np.uint8)
        db = str(tmp_path / "cpm.kvdb")
        write_cpm_db([(img, meta, np.full((80, 100), 255, np.uint8))], db)

        proto = {"name": "c", "layer": [
            {"name": "d", "type": "CPMData", "top": ["data", "label"],
             "data_param": {"source": db, "batch_size": 2},
             "transform_param": {"stride": 8, "crop_size_x": 112,
                                 "crop_size_y": 96, "num_parts": 56,
                                 "np_in_lmdb": 17}}]}
        net = Net(proto, phase="TRAIN")
        assert net.blob_infos["data"].shape_caffe == (2, 3, 96, 112)
        assert net.blob_infos["label"].shape_caffe == (2, 114, 12, 14)
        batch = net.data_layers[0].next_batch()
        assert batch["data"].shape == (2, 3, 96, 112)
        assert batch["label"].shape == (2, 114, 12, 14)


class TestKvdbCrashSafety:
    def test_interrupted_commit_preserves_old_view(self, tmp_path):
        """A commit that dies before the header flip must leave the previous
        committed state fully readable (records append after the live
        index; header updates last)."""
        path = str(tmp_path / "crash.kvdb")
        _fill(path, [(b"a", b"1"), (b"b", b"2")])
        size_before = os.path.getsize(path)
        # simulate a torn commit: garbage appended at EOF, header untouched
        with open(path, "ab") as f:
            f.write(b"\x99" * 123)
        with dbmod.open_db(path, "r") as d:
            assert len(d) == 2
            assert d.get(b"a") == b"1" and d.get(b"b") == b"2"
        # and a real second commit on top still works
        d = dbmod.open_db(path, "w")
        txn = d.new_transaction()
        txn.put(b"c", b"3")
        txn.commit()
        assert len(d) == 3 and d.get(b"c") == b"3"
        assert d.get(b"a") == b"1"
        d.close()
        assert os.path.getsize(path) > size_before
