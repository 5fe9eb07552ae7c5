"""Cross-IMPLEMENTATION parity for the legacy-proto migration: the
reference's ``UpgradeNetAsNeeded`` (upgrade_proto.cpp — V0 padding-layer
dissolution + per-type param moves :70-684, V1 name/type tables :685-960,
input-field modernization) compiled unmodified into native/ref_oracle
(--upgrade mode) migrates the same legacy prototxts as
``proto/upgrade.py``, and the upgraded NetParameters must agree
field-for-field.
"""

import os
import subprocess

import pytest

from caffe_rtpose_tpu.proto import prototxt
from caffe_rtpose_tpu.proto.upgrade import upgrade_net_as_needed

REF = "/root/reference"
BUILD = "/tmp/ref_oracle_build"
ORACLE = os.path.join(BUILD, "ref_oracle")
HERE = os.path.dirname(__file__)
BUILD_SH = os.path.join(HERE, "..", "native", "ref_oracle", "build.sh")


@pytest.fixture(scope="session")
def oracle():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    r = subprocess.run(["bash", BUILD_SH, BUILD], capture_output=True,
                       text=True)
    if r.returncode != 0 or not os.path.exists(ORACLE):
        pytest.skip(f"oracle build failed: {r.stderr[-500:]}")
    return ORACLE


V0_PROTOTXT = """
name: "v0_net"
input: "data"
input_dim: 1 input_dim: 3 input_dim: 16 input_dim: 16
layers {
  layer { name: "pad1" type: "padding" pad: 2 }
  bottom: "data" top: "pad1"
}
layers {
  layer {
    name: "conv1" type: "conv" num_output: 4 kernelsize: 5 stride: 1
    group: 1 biasterm: true
    weight_filler { type: "gaussian" std: 0.1 }
    blobs_lr: 1.0 blobs_lr: 2.0 weight_decay: 1.0 weight_decay: 0.0
  }
  bottom: "pad1" top: "conv1"
}
layers { layer { name: "relu1" type: "relu" } bottom: "conv1" top: "conv1" }
layers {
  layer { name: "pool1" type: "pool" pool: AVE kernelsize: 2 stride: 2 }
  bottom: "conv1" top: "pool1"
}
layers {
  layer { name: "norm1" type: "lrn" local_size: 3 alpha: 2.0 beta: 0.5 }
  bottom: "pool1" top: "norm1"
}
layers {
  layer { name: "drop1" type: "dropout" dropout_ratio: 0.3 }
  bottom: "norm1" top: "norm1"
}
layers {
  layer { name: "fc1" type: "innerproduct" num_output: 7 biasterm: false
          weight_filler { type: "constant" value: 0.01 } }
  bottom: "norm1" top: "fc1"
}
layers { layer { name: "prob" type: "softmax" } bottom: "fc1" top: "prob" }
"""

V1_PROTOTXT = """
name: "v1_net"
input: "data"
input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
layers {
  name: "conv" type: CONVOLUTION bottom: "data" top: "conv"
  blobs_lr: 1.0 blobs_lr: 2.0 weight_decay: 1.0 weight_decay: 0.0
  convolution_param { num_output: 5 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } }
}
layers { name: "act" type: TANH bottom: "conv" top: "act" }
layers {
  name: "pool" type: POOLING bottom: "act" top: "pool"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 }
}
layers {
  name: "ip" type: INNER_PRODUCT bottom: "pool" top: "ip"
  inner_product_param { num_output: 4 }
}
layers {
  name: "loss" type: SOFTMAX_LOSS bottom: "ip" bottom: "label" top: "loss"
}
input: "label"
input_shape { dim: 2 }
"""


def _normalize(v):
    """DebugString prints proto2 semantics: emit-if-set, enum symbols,
    shortest float repr.  Our dicts carry the parsed equivalents; compare
    after normalizing numbers (int vs float spellings of the same value)."""
    if isinstance(v, dict):
        return {k: _normalize(x) for k, x in sorted(v.items())}
    if isinstance(v, list):
        return [_normalize(x) for x in v]
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        f = float(v)
        return int(f) if f == int(f) else f
    return v


V0_DATA_PROTOTXT = """
name: "v0_data_net"
layers {
  layer {
    name: "data" type: "data" source: "train_db" batchsize: 4
    scale: 0.0078125 meanfile: "mean.binaryproto" cropsize: 8 mirror: true
    rand_skip: 2
  }
  top: "data" top: "label"
}
layers {
  layer {
    name: "win" type: "window_data" source: "win.txt" batchsize: 2
    cropsize: 12 mirror: false det_fg_threshold: 0.6 det_bg_threshold: 0.4
    det_fg_fraction: 0.3 det_context_pad: 5 det_crop_mode: "square"
  }
  top: "win" top: "winlab"
}
layers {
  layer {
    name: "imgs" type: "images" source: "list.txt" batchsize: 3
    scale: 0.5 new_height: 32 new_width: 24 shuffle_images: true
  }
  top: "imgs" top: "imglab"
}
layers {
  layer { name: "cc" type: "concat" concat_dim: 1 }
  bottom: "data" bottom: "imgs" top: "cc"
}
layers {
  layer { name: "ig" type: "infogain_loss" source: "H.binaryproto" }
  bottom: "cc" bottom: "label" top: "ig"
}
layers {
  layer { name: "h5o" type: "hdf5_output"
          hdf5_output_param { file_name: "out.h5" } }
  bottom: "cc" bottom: "label"
}
"""


@pytest.mark.parametrize("tag,text", [("v0", V0_PROTOTXT),
                                      ("v0_data", V0_DATA_PROTOTXT),
                                      ("v1", V1_PROTOTXT)])
def test_upgrade_matches_reference_build(oracle, tmp_path, tag, text):
    src = tmp_path / f"{tag}.prototxt"
    src.write_text(text)
    out = tmp_path / f"{tag}.upgraded.prototxt"
    r = subprocess.run([oracle, "--upgrade", str(src), str(out)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    want = prototxt.parse(out.read_text())

    ours = upgrade_net_as_needed(prototxt.parse(text), upgrade_input=True)

    assert _normalize(ours) == _normalize(want)
