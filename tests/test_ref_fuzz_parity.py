"""Property-based cross-implementation fuzz: randomly composed layer DAGs
(conv/pool/LRN/eltwise/concat/slice/IP/neurons, in-place chains, fan-out)
run through BOTH this framework and the reference Caffe CPU build with
shared weights, and every terminal blob must agree.

Curated zoo cases (test_ref_layer_zoo.py) pin each layer alone; this
sweep hunts INTERACTION bugs — in-place chains rewriting fan-out blobs,
split insertion, shape arithmetic across stacked strided ops — that
hand-picked cases miss.  Shapes are derived with caffe's own formulas
(conv floor, pool ceil with the clip rule, net.cpp/pooling_layer.cpp), so
every generated net is valid by construction; a shape disagreement with
the reference build fails the test rather than skipping.
"""

import math
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


def _conv_out(i, k, p, s):
    return (i + 2 * p - k) // s + 1


def _pool_out(i, k, p, s):
    # pooling_layer.cpp ceil mode + clip: start of last window < i + p
    o = int(math.ceil((i + 2 * p - k) / float(s))) + 1
    if p > 0 and (o - 1) * s >= i + p:
        o -= 1
    return o


class _Gen:
    """Random valid net builder.  Tracks (name, shape) of live blobs."""

    def __init__(self, rs, train_safe=False):
        # train_safe: no Dropout — in TRAIN phase its mask is drawn from
        # each implementation's own rng, so activations can never match
        self.train_safe = train_safe
        self.rs = rs
        self.lines = []
        self.n = 0
        self.blobs = []  # (name, (N, C, H, W))
        # blobs consumed at least once: an IN-PLACE layer on such a blob
        # is illegal in the reference (InsertSplits rewrites its bottom to
        # a split top while the top keeps the old name -> "produced by
        # multiple sources"); plain multi-reader fan-out is fine
        self.consumed = set()

    def name(self, kind):
        self.n += 1
        return f"{kind}{self.n}"

    def pick(self):
        b, shape = self.blobs[self.rs.randint(len(self.blobs))]
        self.consumed.add(b)
        return b, shape

    def add(self, line, top, shape):
        self.lines.append(line)
        self.blobs.append((top, shape))

    def step(self):
        rs = self.rs
        kinds = ["neuron", "neuron", "conv", "pool", "lrn",
                 "eltwise", "concat", "slice", "power",
                 "inplace_chain", "scale", "mvn", "dropout", "deconv"]
        if self.train_safe:
            kinds.remove("dropout")
            # caffe's top_data-dependent backward (TanH/Sigmoid/MVN...)
            # silently corrupts when ANY later in-place layer overwrites
            # the shared buffer; the grad sweep tests the math, not
            # caffe's aliasing hazards (single in-place is covered in
            # test_ref_grad_parity)
            kinds.remove("inplace_chain")
        kind = rs.choice(kinds)
        if kind == "inplace_chain":
            cands = [x for x in self.blobs
                     if x[0] not in self.consumed and x[0] != "x"]
            if not cands:
                return
            b, (N, C, H, W) = cands[rs.randint(len(cands))]
            self.consumed.add(b)
        else:
            b, (N, C, H, W) = self.pick()
        if kind == "neuron":
            t = rs.choice(["ReLU", "TanH", "Sigmoid", "ELU", "BNLL",
                           "AbsVal"])
            nm = self.name("nrn")
            self.add(f'layer {{ name: "{nm}" type: "{t}" bottom: "{b}" '
                     f'top: "{nm}" }}', nm, (N, C, H, W))
        elif kind == "inplace_chain":
            # 2-3 in-place neurons rewriting the SAME blob name, then a
            # fresh top — exercises in-place detection + split insertion
            cur = b
            for _ in range(rs.randint(2, 4)):
                t = rs.choice(["ReLU", "TanH", "Sigmoid"])
                nm = self.name("ip")
                self.lines.append(
                    f'layer {{ name: "{nm}" type: "{t}" bottom: "{cur}" '
                    f'top: "{cur}" }}')
            nm = self.name("cap")
            self.add(f'layer {{ name: "{nm}" type: "AbsVal" '
                     f'bottom: "{cur}" top: "{nm}" }}', nm, (N, C, H, W))
        elif kind == "conv" and min(H, W) >= 3:
            k = int(rs.choice([1, 3]))
            s = int(rs.choice([1, 1, 2]))
            p = int(rs.choice([0, 1])) if k == 3 else 0
            groups = [g for g in (1, 2) if C % g == 0]
            g = int(rs.choice(groups))
            co = int(rs.choice([4, 6, 8]))
            co -= co % g
            nm = self.name("cv")
            oh, ow = _conv_out(H, k, p, s), _conv_out(W, k, p, s)
            if oh < 1 or ow < 1:
                return
            self.add(
                f'layer {{ name: "{nm}" type: "Convolution" bottom: "{b}" '
                f'top: "{nm}" convolution_param {{ num_output: {co} '
                f'kernel_size: {k} stride: {s} pad: {p} group: {g} '
                f'weight_filler {{ type: "constant" }} }} }}',
                nm, (N, co, oh, ow))
        elif kind == "pool" and min(H, W) >= 3:
            k, s = 3, int(rs.choice([1, 2]))
            p = int(rs.choice([0, 1]))
            method = rs.choice(["MAX", "AVE"])
            nm = self.name("pl")
            oh, ow = _pool_out(H, k, p, s), _pool_out(W, k, p, s)
            if oh < 1 or ow < 1:
                return
            self.add(
                f'layer {{ name: "{nm}" type: "Pooling" bottom: "{b}" '
                f'top: "{nm}" pooling_param {{ pool: {method} '
                f'kernel_size: {k} stride: {s} pad: {p} }} }}',
                nm, (N, C, oh, ow))
        elif kind == "lrn":
            nm = self.name("lr")
            self.add(f'layer {{ name: "{nm}" type: "LRN" bottom: "{b}" '
                     f'top: "{nm}" lrn_param {{ local_size: 3 alpha: 0.5 '
                     f'beta: 0.6 }} }}', nm, (N, C, H, W))
        elif kind == "power":
            nm = self.name("pw")
            self.add(f'layer {{ name: "{nm}" type: "Power" bottom: "{b}" '
                     f'top: "{nm}" power_param {{ power: 2.0 scale: 0.5 '
                     f'shift: 0.3 }} }}', nm, (N, C, H, W))
        elif kind == "eltwise":
            mates = [x for x in self.blobs
                     if x[1] == (N, C, H, W) and x[0] != b]
            if not mates:
                return
            b2 = mates[rs.randint(len(mates))][0]
            self.consumed.add(b2)
            op = rs.choice(["SUM", "PROD", "MAX"])
            nm = self.name("el")
            self.add(
                f'layer {{ name: "{nm}" type: "Eltwise" bottom: "{b}" '
                f'bottom: "{b2}" top: "{nm}" eltwise_param '
                f'{{ operation: {op} }} }}', nm, (N, C, H, W))
        elif kind == "concat":
            mates = [x for x in self.blobs
                     if x[1][0] == N and x[1][2:] == (H, W) and x[0] != b]
            if not mates:
                return
            b2, s2 = mates[rs.randint(len(mates))]
            self.consumed.add(b2)
            nm = self.name("cc")
            self.add(
                f'layer {{ name: "{nm}" type: "Concat" bottom: "{b}" '
                f'bottom: "{b2}" top: "{nm}" }}', nm,
                (N, C + s2[1], H, W))
        elif kind == "deconv" and max(H, W) <= 12:
            k = int(rs.choice([2, 3]))
            st = int(rs.choice([1, 2]))
            g = int(rs.choice([x for x in (1, 2) if C % x == 0]))
            co = 4
            nm = self.name("dc")
            oh = st * (H - 1) + k
            ow = st * (W - 1) + k
            self.add(
                f'layer {{ name: "{nm}" type: "Deconvolution" '
                f'bottom: "{b}" top: "{nm}" convolution_param '
                f'{{ num_output: {co} kernel_size: {k} stride: {st} '
                f'group: {g} weight_filler {{ type: "constant" }} }} }}',
                nm, (N, co, oh, ow))
        elif kind == "scale":
            nm = self.name("sc")
            self.add(f'layer {{ name: "{nm}" type: "Scale" bottom: "{b}" '
                     f'top: "{nm}" scale_param {{ axis: 1 bias_term: true '
                     f'}} }}', nm, (N, C, H, W))
        elif kind == "mvn":
            nm = self.name("mv")
            variant = rs.choice(["", " mvn_param { normalize_variance: "
                                 "false }", " mvn_param { across_channels:"
                                 " true }"])
            self.add(f'layer {{ name: "{nm}" type: "MVN" bottom: "{b}" '
                     f'top: "{nm}"{variant} }}', nm, (N, C, H, W))
        elif kind == "dropout":
            # TEST phase: identity pass-through both sides (phase gate)
            nm = self.name("dr")
            self.add(f'layer {{ name: "{nm}" type: "Dropout" '
                     f'bottom: "{b}" top: "{nm}" dropout_param '
                     f'{{ dropout_ratio: 0.4 }} }}', nm, (N, C, H, W))
        elif kind == "slice" and C >= 2:
            cut = int(rs.randint(1, C))
            nm = self.name("sl")
            self.lines.append(
                f'layer {{ name: "{nm}" type: "Slice" bottom: "{b}" '
                f'top: "{nm}a" top: "{nm}b" slice_param {{ axis: 1 '
                f'slice_point: {cut} }} }}')
            self.blobs.append((f"{nm}a", (N, cut, H, W)))
            self.blobs.append((f"{nm}b", (N, C - cut, H, W)))


def _generate(seed, train_safe=False):
    rs = np.random.RandomState(seed)
    g = _Gen(rs, train_safe=train_safe)
    N, C, H, W = 2, int(rs.choice([2, 3, 4])), \
        int(rs.randint(6, 11)), int(rs.randint(6, 11))
    g.blobs.append(("x", (N, C, H, W)))
    for _ in range(int(rs.randint(6, 14))):
        g.step()
    header = ['name: "fuzz"', 'input: "x"',
              f"input_shape {{ dim: {N} dim: {C} dim: {H} dim: {W} }}"]
    proto = "\n".join(header + g.lines)
    # terminal blobs = produced but never consumed
    consumed = set()
    for ln in g.lines:
        for part in ln.split("bottom: ")[1:]:
            consumed.add(part.split('"')[1])
    outs = [nm for nm, _ in g.blobs if nm not in consumed and nm != "x"]
    shapes = {nm: s for nm, s in g.blobs}
    return proto, (N, C, H, W), outs, shapes


@pytest.mark.parametrize("seed", range(32))
def test_fuzz_net_matches_reference(oracle, tmp_path, seed):
    from tests.test_ref_layer_zoo import run_case

    proto, in_shape, outs, shapes = _generate(seed)
    if not outs:
        pytest.skip("degenerate draw (no terminal blobs)")
    rs = np.random.RandomState(1000 + seed)
    x = rs.randn(*in_shape).astype(np.float32)
    # chained nets amplify accumulation-order noise (lax conv vs caffe
    # gemm), especially through MVN's variance division — tolerances are
    # looser than the single-layer zoo accordingly
    run_case(oracle, str(tmp_path), f"fuzz{seed}", proto, [("x", x)],
             outs, rtol=1e-3, atol=3e-5)


@pytest.mark.parametrize("seed", range(40, 54))
def test_fuzz_grad_matches_reference(oracle, tmp_path, seed):
    """Backward sweep: the same random DAGs with an IP+EuclideanLoss head,
    force_backward — jax.grad vs the reference's net.Backward() on input
    and conv/IP param gradients."""
    from tests.test_ref_grad_parity import run_grad_case

    proto, in_shape, outs, shapes = _generate(seed, train_safe=True)
    if not outs:
        pytest.skip("degenerate draw (no terminal blobs)")
    N = in_shape[0]
    head = outs[0]
    rs = np.random.RandomState(2000 + seed)
    x = rs.randn(*in_shape).astype(np.float32)
    t = rs.randn(N, 4).astype(np.float32)
    full = (proto.replace('name: "fuzz"',
                          'name: "fuzzg"\nforce_backward: true')
            + f'\ninput: "t"\ninput_shape {{ dim: {N} dim: 4 }}'
            + f'\nlayer {{ name: "iph" type: "InnerProduct" '
              f'bottom: "{head}" top: "iph" '
              f'inner_product_param {{ num_output: 4 }} }}'
            + '\nlayer { name: "loss" type: "EuclideanLoss" '
              'bottom: "iph" bottom: "t" top: "loss" }')
    # only convs UPSTREAM of the loss head get gradients (other terminal
    # branches legitimately see zero — force_backward still runs them but
    # nothing flows INTO them from this loss)
    produced = {}
    consumes = {}
    for ln in proto.splitlines():
        if not ln.startswith("layer"):
            continue
        nm = ln.split('"')[1]
        tops = [p.split('"')[1] for p in ln.split("top: ")[1:]]
        bots = [p.split('"')[1] for p in ln.split("bottom: ")[1:]]
        consumes[nm] = bots
        for tp in tops:
            produced[tp] = nm
    reach = set()
    frontier = [head]
    while frontier:
        blob = frontier.pop()
        lyr = produced.get(blob)
        if lyr and lyr not in reach:
            reach.add(lyr)
            frontier.extend(consumes[lyr])
    pgrad = [ln.split('"')[1] for ln in proto.splitlines()
             if '"Convolution"' in ln and ln.split('"')[1] in reach] + ["iph"]
    run_grad_case(oracle, str(tmp_path), f"fuzzg{seed}", full,
                  [("x", x), ("t", t)], grad_blobs=["x"],
                  pgrad_layers=pgrad, rtol=5e-4, atol=1e-5)
