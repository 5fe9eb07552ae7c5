"""summarize tool — the tools/extra/summarize.py analog (+ --shapes)."""

from caffe_rtpose_tpu.tools.summarize import main as summarize_main, summarize

_NET = """
name: "t"
input: "x" input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
layer { name: "c" type: "Convolution" bottom: "x" top: "c"
  param { lr_mult: 1 decay_mult: 1 } param { lr_mult: 2 decay_mult: 0 }
  convolution_param { num_output: 4 kernel_size: 3 pad: 1
    weight_filler { type: "gaussian" std: 0.01 } } }
layer { name: "r" type: "ReLU" bottom: "c" top: "c" }
layer { name: "bad" type: "ReLU" bottom: "ghost" top: "g" }
"""


def test_summarize_table(tmp_path):
    p = tmp_path / "n.prototxt"
    p.write_text(_NET)
    out = summarize(str(p), color=False)
    lines = out.splitlines()
    assert lines[0].split() == ["Layer", "Type", "Bottoms", "Tops", "Params"]
    assert any(line.startswith("c ") and "Convolution" in line
               and "x1/d1, x2/d0" in line and "gaussian std=0.01" in line
               for line in lines)
    assert out.rstrip().endswith("3 layers, 4 blobs")


def test_summarize_marks_disconnected_bottom(tmp_path):
    p = tmp_path / "n.prototxt"
    p.write_text(_NET)
    out = summarize(str(p), color=True)
    # 'ghost' is consumed but never produced -> red-background ANSI code
    assert "\x1b[41mghost\x1b[0m" in out
    # 'x' is a declared input -> normal palette color
    assert "\x1b[41mx\x1b[0m" not in out


def test_summarize_shapes(tmp_path, capsys):
    p = tmp_path / "n.prototxt"
    # --shapes builds the graph, so drop the dangling layer
    p.write_text("\n".join(line for line in _NET.splitlines()
                           if "ghost" not in line))
    assert summarize_main(["-s", "--no-color", str(p)]) == 0
    out = capsys.readouterr().out
    assert "c 2x4x8x8" in out  # conv top shape, caffe NCHW
