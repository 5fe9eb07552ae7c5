"""Reference CPM-LMDB binary record codec (training/cpm_lmdb.py).

The encode side fabricates records in the genLMDB layout that
ReadMetaData (reference data_transformer.cpp:577-676) defines; the decode
side is the clean-room ReadMetaData.  Decoded metadata must drive the
augmentation/label pipeline identically to natively-constructed Meta
(VERDICT r1, Next #3 done-criterion).
"""

import os
import struct

import numpy as np
import pytest

from caffe_rtpose_tpu.training.cpm_lmdb import (
    CpmDatumSource, RecordInfo, decode_cpm_datum, encode_cpm_datum,
    write_cpm_db)
from caffe_rtpose_tpu.training.transformer import (
    AugParams, Meta, Person, transform, transform_joints_coco)


def _coco_meta(rng, num_other=2, h=96, w=128):
    """Random raw-COCO (17-joint) Meta with coords inside the image."""
    people = []
    for p in range(1 + num_other):
        # quantize to 1/64 px so the 1-indexed f32 storage (+1/-1) is exact
        joints = np.stack([rng.uniform(2, w - 3, 17),
                           rng.uniform(2, h - 3, 17)], 1).astype(np.float32)
        joints = np.round(joints * 64) / 64
        vis = rng.randint(0, 2, 17).astype(np.int32)
        if p == 0:
            vis[3] = 3  # absent joint on the main person
        joints[5] = (-7.0, 4.0)  # out-of-image -> decode must yield vis 2
        objpos = np.array([w / 2 + p, h / 2 - p], np.float32)
        people.append(Person(joints=joints, visible=vis, objpos=objpos))
    # scale_self is an f32 in the stored record (MetaData.scale_self)
    return Meta(people=people, scale_self=float(np.float32(0.8)))


def _derive_vis(meta, h, w):
    """Apply the ReadMetaData visibility semantics (out-of-image -> 2; only
    the main person keeps 3) to raw flags — what a user constructing Meta
    natively would record."""
    people = []
    for k, p in enumerate(meta.people):
        vis = p.visible.copy()
        for i, (x, y) in enumerate(p.joints):
            if k > 0 and vis[i] == 3:
                vis[i] = 1
            if vis[i] != 3 and (x < 0 or y < 0 or x >= w or y >= h):
                vis[i] = 2
        people.append(Person(joints=p.joints, visible=vis, objpos=p.objpos))
    return Meta(people=people, scale_self=meta.scale_self)


def test_roundtrip_meta_and_planes():
    rng = np.random.RandomState(0)
    meta = _coco_meta(rng)
    img = rng.randint(0, 256, (96, 128, 3), np.uint8)
    mask = rng.randint(0, 2, (96, 128), np.uint8) * 255
    info = RecordInfo(dataset="COCO", img_height=96.0, img_width=128.0,
                      is_validation=True, people_index=3, annolist_index=17,
                      write_number=5, total_write_number=100,
                      scale_other=[0.5, 1.5])
    datum = encode_cpm_datum(img, meta, mask_miss=mask, info=info)
    assert datum["channels"] == 6

    img2, mask2, mask_all, meta2, info2 = decode_cpm_datum(datum)
    np.testing.assert_array_equal(img, img2)
    np.testing.assert_array_equal(mask, mask2)
    assert mask_all is None  # mode 5 carries no mask_all (dt.cpp:1228,1249)
    assert info2.dataset == "COCO"
    assert info2.is_validation and info2.people_index == 3
    assert (info2.annolist_index, info2.write_number,
            info2.total_write_number) == (17, 5, 100)
    assert info2.scale_other == pytest.approx([0.5, 1.5])
    assert meta2.scale_self == pytest.approx(0.8)
    assert len(meta2.people) == 3
    for p, p2 in zip(meta.people, meta2.people):
        np.testing.assert_allclose(p.joints, p2.joints, atol=1e-5)
        np.testing.assert_allclose(p.objpos, p2.objpos, atol=1e-5)
        assert p2.visible[5] == 2  # derived out-of-image
    assert meta2.main.visible[3] == 3  # absent survives (main only)


def test_binary_layout_matches_readmetadata_spec():
    """Check raw byte positions directly against the ReadMetaData offsets
    (independent of our own decoder)."""
    rng = np.random.RandomState(1)
    meta = _coco_meta(rng, num_other=1)
    img = np.zeros((96, 128, 3), np.uint8)
    datum = encode_cpm_datum(img, meta, info=RecordInfo(
        dataset="MYSET", img_height=96.0, img_width=128.0))
    data, w = datum["data"], 128
    offset3 = 3 * 96 * 128
    # dataset name NUL-terminated at offset3 (:579)
    assert data[offset3 : offset3 + 6] == b"MYSET\x00"
    # height,width floats at offset3+offset1 (:582-584)
    assert struct.unpack_from("<ff", data, offset3 + w) == (96.0, 128.0)
    # numOtherPeople byte at offset3+2*offset1+1 (:587)
    assert data[offset3 + 2 * w + 1] == 1
    # objpos floats at offset3+3*offset1, stored 1-indexed (:617-620)
    x, y = struct.unpack_from("<ff", data, offset3 + 3 * w)
    assert (x - 1, y - 1) == pytest.approx(tuple(meta.main.objpos))
    # scale_self at offset3+4*offset1 (:622)
    assert struct.unpack_from("<f", data, offset3 + 4 * w)[0] == \
        pytest.approx(0.8)
    # joint x row at offset3+5*offset1, 1-indexed (:626)
    jx = struct.unpack_from("<17f", data, offset3 + 5 * w)
    np.testing.assert_allclose(np.asarray(jx) - 1, meta.main.joints[:, 0],
                               atol=1e-5)
    # other person objpos at row 8, scale_other at row 8+numOther (:649-656)
    ox, oy = struct.unpack_from("<ff", data, offset3 + 8 * w)
    assert (ox - 1, oy - 1) == pytest.approx(tuple(meta.others[0].objpos))


def test_decoded_meta_drives_transformer_identically():
    """The VERDICT done-criterion: a record in the reference binary layout,
    decoded, must produce the same augmented data+labels as the natively
    constructed Meta."""
    rng = np.random.RandomState(7)
    raw = _coco_meta(rng, num_other=1, h=120, w=160)
    img = rng.randint(0, 256, (120, 160, 3), np.uint8)
    mask = np.full((120, 160), 255, np.uint8)
    mask[40:60, 50:90] = 0

    datum = encode_cpm_datum(img, raw, mask_miss=mask)
    img2, mask2, _, meta2, _ = decode_cpm_datum(datum)

    def to_ours(meta):
        # transform() mutates meta in place — build fresh copies per call
        people = [Person(*transform_joints_coco(p.joints.copy(), p.visible),
                         objpos=p.objpos.copy()) for p in meta.people]
        return Meta(people=people, scale_self=meta.scale_self)

    raw_d = _derive_vis(raw, 120, 160)
    prm = AugParams(crop_size_x=112, crop_size_y=96)
    d1, l1, _ = transform(img, to_ours(raw_d), prm,
                          rng=np.random.RandomState(3))
    d2, l2, _ = transform(img2, to_ours(meta2), prm,
                          rng=np.random.RandomState(3), mask_miss=mask2)
    d1b, l1b, _ = transform(img, to_ours(raw_d), prm,
                            rng=np.random.RandomState(3), mask_miss=mask)
    np.testing.assert_array_equal(d2, d1b)
    np.testing.assert_array_equal(l2, l1b)
    assert not np.array_equal(l1, l1b)  # the mask actually matters


def test_cpm_datum_source_over_kvdb(tmp_path):
    rng = np.random.RandomState(2)
    recs = []
    for i in range(3):
        meta = _coco_meta(rng, num_other=i % 2, h=100, w=140)
        img = rng.randint(0, 256, (100, 140, 3), np.uint8)
        recs.append((img, meta, np.full((100, 140), 255, np.uint8)))
    path = str(tmp_path / "cpm.kvdb")
    assert write_cpm_db(recs, path) == 3

    src = CpmDatumSource(path, backend="kvdb")
    assert len(src) == 3
    img, meta, mask = src[1]
    np.testing.assert_array_equal(img, recs[1][0])
    # converted to the np=56 training layout (first 18 slots are the
    # 'ours' parts, the rest default-initialized like the reference's
    # resize(np))
    assert meta.main.joints.shape == (56, 2)
    raw_d = _derive_vis(recs[1][1], 100, 140)
    j18, v18 = transform_joints_coco(raw_d.main.joints, raw_d.main.visible)
    np.testing.assert_allclose(meta.main.joints[:18], j18, atol=1e-5)
    np.testing.assert_array_equal(meta.main.visible[:18], v18)
    assert np.all(meta.main.joints[18:] == 0)
    assert np.all(meta.main.visible[18:] == 0)


def test_train_data_spec_cpm_lmdb(tmp_path):
    """`caffe train --data cpm-lmdb:PATH` pulls reference-format records
    through the CPM transformer."""
    from types import SimpleNamespace

    from caffe_rtpose_tpu.tools.caffe_tool import make_data_iter

    rng = np.random.RandomState(5)
    meta = _coco_meta(rng, num_other=0, h=100, w=140)
    img = rng.randint(0, 256, (100, 140, 3), np.uint8)
    path = str(tmp_path / "train.kvdb")
    write_cpm_db([(img, meta, np.full((100, 140), 255, np.uint8))], path)

    net = SimpleNamespace(
        data_layers=None, input_names=["data"],
        blob_infos={"data": SimpleNamespace(shape_caffe=(2, 3, 368, 368))})
    it = make_data_iter(f"cpm-lmdb:{path}", net)
    batch = next(it)
    assert batch["data"].shape == (2, 3, 368, 368)
    # 2*(np+1) = 114 channels: 57 per-channel weights + 57 targets
    assert batch["label"].shape == (2, 114, 46, 46)


def test_capacity_validation():
    rng = np.random.RandomState(4)
    meta = _coco_meta(rng, num_other=0, h=96, w=128)
    with pytest.raises(ValueError):
        encode_cpm_datum(np.zeros((6, 128, 3), np.uint8), meta)  # too short
    with pytest.raises(ValueError):
        encode_cpm_datum(np.zeros((96, 40, 3), np.uint8), Meta(
            people=[Person(joints=np.zeros((17, 2), np.float32),
                           visible=np.zeros(17, np.int32))]))  # too narrow


def test_cpmdata_graph_layer_trains(tmp_path):
    """A caffe_train-style prototxt with a CPMData layer trains unmodified:
    the layer decodes genLMDB records and runs the Transform_nv chain with
    the transform_param knobs (no --data flag needed)."""
    import subprocess
    import sys

    rng = np.random.RandomState(9)
    recs = []
    for i in range(4):
        meta = _coco_meta(rng, num_other=i % 2, h=100, w=140)
        img = rng.randint(0, 256, (100, 140, 3), np.uint8)
        recs.append((img, meta, np.full((100, 140), 255, np.uint8)))
    db = str(tmp_path / "cpmdb")
    write_cpm_db(recs, db)

    net = tmp_path / "train.prototxt"
    net.write_text("""
name: "cpm_train"
layer {
  name: "data" type: "CPMData" top: "data" top: "label"
  data_param { source: "%s" batch_size: 2 }
  transform_param {
    stride: 8 crop_size_x: 112 crop_size_y: 96 target_dist: 0.6
    scale_prob: 1.0 scale_min: 0.7 scale_max: 1.3 max_rotate_degree: 30
    center_perterb_max: 20 flip_prob: 0.5 sigma: 7.0
    num_parts: 56 np_in_lmdb: 17 transform_body_joint: true
  }
}
layer { name: "conv" type: "Convolution" bottom: "data" top: "c"
  convolution_param { num_output: 8 kernel_size: 3 stride: 8 pad: 1
    weight_filler { type: "gaussian" std: 0.01 } } }
layer { name: "score" type: "Convolution" bottom: "c" top: "s"
  convolution_param { num_output: 114 kernel_size: 1
    weight_filler { type: "gaussian" std: 0.01 } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "s" bottom: "label"
  top: "loss" }
""" % db)
    solver = tmp_path / "solver.prototxt"
    solver.write_text(f'net: "{net}"\nbase_lr: 0.0001\nmomentum: 0.9\n'
                      'lr_policy: "fixed"\nmax_iter: 2\ndisplay: 1\n')
    r = subprocess.run(
        [sys.executable, "-m", "caffe_rtpose_tpu.tools.caffe_tool",
         "train", "--solver", str(solver)],
        capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-800:]
    assert "Optimization Done" in r.stdout
