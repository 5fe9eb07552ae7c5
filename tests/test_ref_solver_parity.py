"""Cross-IMPLEMENTATION optimizer-trajectory parity: the reference Solver
(sgd_solver.cpp + the 5 variants, compiled unmodified into native/ref_oracle
--solve mode) steps a small training net N iterations from shared initial
weights; our Solver must land on the same final parameters — validating lr
policies, momentum/history rules, weight decay, gradient clipping and
iter_size accumulation against the reference's own update code.

The net carries its own data (a frozen Parameter blob as input + a constant
DummyData target) so both sides consume byte-identical batches with no RNG.
"""

import os
import subprocess

import numpy as np
import pytest

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


NET = """
name: "solvenet"
layer { name: "x" type: "Parameter" top: "x"
  param { lr_mult: 0 decay_mult: 0 }
  parameter_param { shape { dim: 4 dim: 3 dim: 6 dim: 6 } } }
layer { name: "tgt" type: "DummyData" top: "t"
  dummy_data_param { shape { dim: 4 dim: 5 }
    data_filler { type: "constant" value: 0.25 } } }
layer { name: "conv" type: "Convolution" bottom: "x" top: "c"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 2 } }
layer { name: "relu" type: "ReLU" bottom: "c" top: "c" }
layer { name: "fc" type: "InnerProduct" bottom: "c" top: "f"
  inner_product_param { num_output: 5 } }
layer { name: "loss" type: "EuclideanLoss" bottom: "f" bottom: "t"
  top: "loss" }
"""

SOLVERS = {
    "sgd_step_decay": """
type: "SGD"
base_lr: 0.05 lr_policy: "step" gamma: 0.5 stepsize: 3
momentum: 0.9 weight_decay: 0.003
""",
    "sgd_clip_itersize": """
type: "SGD"
base_lr: 0.05 lr_policy: "fixed" momentum: 0.9
clip_gradients: 0.4 iter_size: 2
""",
    "nesterov_poly": """
type: "Nesterov"
base_lr: 0.04 lr_policy: "poly" power: 1.5 momentum: 0.9
""",
    "adagrad_inv": """
type: "AdaGrad"
base_lr: 0.05 lr_policy: "inv" gamma: 0.1 power: 0.75
""",
    "rmsprop": """
type: "RMSProp"
base_lr: 0.02 lr_policy: "fixed" rms_decay: 0.95 delta: 1e-8
""",
    "adadelta": """
type: "AdaDelta"
base_lr: 1.0 lr_policy: "fixed" momentum: 0.95 delta: 1e-6
""",
    "adam": """
type: "Adam"
base_lr: 0.01 lr_policy: "fixed" momentum: 0.9 momentum2: 0.999
delta: 1e-8
""",
    "sgd_exp_policy": """
type: "SGD"
base_lr: 0.05 lr_policy: "exp" gamma: 0.9 momentum: 0.9
""",
    "sgd_multistep": """
type: "SGD"
base_lr: 0.05 lr_policy: "multistep" gamma: 0.5 stepvalue: 2 stepvalue: 4
momentum: 0.9
""",
    "sgd_sigmoid_policy": """
type: "SGD"
base_lr: 0.05 lr_policy: "sigmoid" gamma: -1.0 stepsize: 3
""",
}

ITERS = 5


@pytest.mark.parametrize("tag", sorted(SOLVERS))
def test_solver_trajectory_matches_reference(oracle, tmp_path, tag):
    import jax.numpy as jnp

    from caffe_rtpose_tpu.core.net import Net
    from caffe_rtpose_tpu.training.solver import Solver

    net_path = tmp_path / "net.prototxt"
    net_path.write_text(NET)
    solver_path = tmp_path / "solver.prototxt"
    solver_path.write_text(
        f'net: "{net_path}"\n{SOLVERS[tag]}\nmax_iter: {ITERS}\n'
        f'display: 0\nsnapshot: 0\nsnapshot_after_train: false\n')

    # shared initial weights (incl. the frozen Parameter data blob)
    net = Net(str(net_path), phase="TRAIN", seed=0)
    rs = np.random.RandomState(11)
    for name in sorted(net.params):
        net.params[name] = [
            jnp.asarray((rs.randn(*np.asarray(p).shape) * 0.3)
                        .astype(np.float32))
            for p in net.params[name]
        ]
    weights = str(tmp_path / "init.caffemodel")
    net.save_caffemodel(weights)

    # ours: step the same solver config
    solver = Solver(solver_path.read_text(), net, lambda it: {})
    solver.step(ITERS)
    impls = {i.name: i for i in net.impls}
    ours = []
    for impl in net.impls:
        for pi, p in zip(impl.params, net.params.get(impl.name, [])):
            ours.append(np.asarray(pi.export_caffe(np.asarray(p)),
                                   np.float32).ravel())
    ours = np.concatenate(ours)

    # reference: same solver, same weights, same iterations
    prefix = str(tmp_path / "ref")
    r = subprocess.run([oracle, "--solve", str(solver_path), weights,
                        str(ITERS), prefix],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    want = np.fromfile(prefix + ".params.raw", np.float32)
    assert ours.size == want.size
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=1e-6,
                               err_msg=tag)
    # the trajectory actually moved
    init = np.fromfile(weights, np.uint8)  # sanity: file exists, non-empty
    assert init.size > 0
    assert np.abs(ours).max() > 0
