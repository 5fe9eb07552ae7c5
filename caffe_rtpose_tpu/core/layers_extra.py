"""Additional Caffe layer types: recurrent family, SPP, Im2col, BatchReindex,
InfogainLoss, Parameter, DummyData, HDF5Output.

Registered into the same registry as core.layers (imported by core.net).
Recurrent semantics follow reference src/caffe/layers/{recurrent,lstm,rnn}_layer.cpp:
time-major bottoms x (T, N, ...) and cont (T, N); hidden state resets where
cont == 0; parameter blobs match Caffe's unrolled-net parameter order so
.caffemodel weights interchange.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import layout
from ..ops import losses as op_losses
from ..ops import nn as op_nn
from ..proto.caffe_pb import POOL_METHOD, View
from . import filler as op_filler
from .layers import (
    BuildCtx,
    LayerImpl,
    ParamInfo,
    _base,
    _param_mults,
    register,
)


@register("Switch")
def build_switch(ctx: BuildCtx) -> LayerImpl:
    """Selects one bottom as the top. The reference ships a Switch-based
    deploy prototxt (model/mpi/pose_deploy_linevec_switch.prototxt) but never
    implemented the layer; here the selection index is a runtime knob
    ('switch_index', default: last bottom = deepest stage)."""
    n = len(ctx.lv.bottom)

    def apply(p, bots, rng, training, knobs=None):
        if knobs and "switch_index" in knobs:
            idx = jnp.clip(knobs["switch_index"].astype(jnp.int32), 0, n - 1)
            out = jax.lax.switch(idx, [lambda b=b: b for b in bots])
            return (out,)
        return (bots[-1],)

    return _base(ctx, apply)


@register("BatchReindex")
def build_batch_reindex(ctx: BuildCtx) -> LayerImpl:
    """top = bottom[0][bottom[1]] along axis 0 (batch_reindex_layer.cpp)."""

    def apply(p, bots, rng, training, knobs=None):
        idx = bots[1].reshape(-1).astype(jnp.int32)
        return (jnp.take(bots[0], idx, axis=0),)

    return _base(ctx, apply)


@register("Parameter")
def build_parameter(ctx: BuildCtx) -> LayerImpl:
    shape = tuple(int(d) for d in ctx.lv.parameter_param.shape.dim)
    lr0, dc0 = _param_mults(ctx.lv, 0)
    if len(shape) == 4:
        # blob is caffe NCHW on the wire; internally it lives in the
        # physical NHWC layout its consumers expect
        phys = (shape[0], shape[2], shape[3], shape[1])
        params = [ParamInfo(
            shape, lambda key: jnp.zeros(phys, jnp.float32),
            lambda a: np.transpose(np.asarray(a).reshape(shape), (0, 2, 3, 1)),
            lambda a: np.transpose(np.asarray(a), (0, 3, 1, 2)),
            lr0, dc0)]
    else:
        params = [ParamInfo(shape, lambda key: jnp.zeros(shape, jnp.float32),
                            lambda a: a.reshape(shape), lambda a: a, lr0, dc0)]

    def apply(p, bots, rng, training, knobs=None):
        return (p[0],)

    return _base(ctx, apply, params, top_nhwc=[len(shape) == 4])


@register("DummyData")
def build_dummy_data(ctx: BuildCtx) -> LayerImpl:
    dp = ctx.lv.dummy_data_param
    shapes: List[tuple] = []
    if dp.shape:
        shapes = [tuple(int(d) for d in bs.dim) for bs in dp.shape]
    else:
        for i in range(len(dp.num)):
            shapes.append((int(dp.num[i]), int(dp.channels[i]), int(dp.height[i]), int(dp.width[i])))
    n_tops = len(ctx.lv.top)
    while len(shapes) < n_tops:
        shapes.append(shapes[-1])
    fillers = list(dp.data_filler) or [View({"type": "constant"}, "FillerParameter")]
    while len(fillers) < n_tops:
        fillers.append(fillers[-1])

    def apply(p, bots, rng, training, knobs=None):
        outs = []
        for i in range(n_tops):
            key = jax.random.fold_in(rng, i)
            arr = op_filler.fill(key, shapes[i], fillers[i])
            if len(shapes[i]) == 4:
                arr = layout.to_physical(arr)
            outs.append(arr)
        return tuple(outs)

    return _base(ctx, apply)


@register("HDF5Output")
def build_hdf5_output(ctx: BuildCtx) -> LayerImpl:
    """Marks bottoms for export; Net.forward collects them post-execution and
    appends to the target file (hdf5_output_layer.cpp writes data/label)."""
    file_name = ctx.lv.hdf5_output_param.file_name

    def apply(p, bots, rng, training, knobs=None):
        return ()

    impl = _base(ctx, apply)
    impl.hdf5_output_file = file_name  # consumed by Net.forward
    return impl


@register("InfogainLoss")
def build_infogain(ctx: BuildCtx) -> LayerImpl:
    lv = ctx.lv
    source = lv.infogain_loss_param.source if lv.infogain_loss_param.has("source") else None
    if len(ctx.bottoms) < 3 and not source:
        raise ValueError("InfogainLoss needs an H matrix (3rd bottom or source file)")
    H_static = None
    if source and len(ctx.bottoms) < 3:
        if source.endswith(".npy"):
            H_static = jnp.asarray(np.load(source), jnp.float32)
        else:
            from ..proto import caffe_pb as pb
            from ..proto import caffemodel, wire

            with open(source, "rb") as f:
                blob = wire.decode(f.read(), pb.SCHEMA, "BlobProto")
            H_static = jnp.asarray(caffemodel.blob_to_array(blob).squeeze())

    def apply(p, bots, rng, training, knobs=None):
        probs = bots[0].reshape(bots[0].shape[0], -1)
        labels = bots[1].reshape(-1)
        H = H_static if H_static is not None else bots[2].reshape(probs.shape[1], probs.shape[1])
        return (op_losses.infogain(probs, labels, H),)

    return _base(ctx, apply, loss_weights=list(lv.loss_weight) or [1.0], top_nhwc=[False])


@register("Im2col")
def build_im2col(ctx: BuildCtx) -> LayerImpl:
    """Patch extraction -> (N, C*kh*kw, oh, ow) in caffe channel order
    (im2col_layer.cpp); physical output NHWC with C = C*kh*kw."""
    cp = ctx.lv.convolution_param
    from .layers import _hw

    kh, kw = _hw(cp.kernel_size, cp.kernel_h if cp.has("kernel_h") else None,
                 cp.kernel_w if cp.has("kernel_w") else None, None)
    sh, sw = _hw(cp.stride, cp.stride_h if cp.has("stride_h") else None,
                 cp.stride_w if cp.has("stride_w") else None, 1)
    ph, pw = _hw(cp.pad, None, None, 0)

    def apply(p, bots, rng, training, knobs=None):
        x = bots[0]  # (N, H, W, C)
        patches = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), (sh, sw), [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # channels ordered C*kh*kw with C slowest (lhs spec order)
        return (patches,)

    return _base(ctx, apply)


@register("SPP")
def build_spp(ctx: BuildCtx) -> LayerImpl:
    """Spatial pyramid pooling (spp_layer.cpp): levels 0..pyramid_height-1,
    level i pools to a 2^i x 2^i grid; outputs concat of flattened levels."""
    sp = ctx.lv.spp_param
    levels = int(sp.pyramid_height)
    method = sp.pool
    x = ctx.bottoms[0]
    n, h, w, c = x.shape_physical
    import math

    plans = []
    for i in range(levels):
        bins = 2 ** i
        kh = int(math.ceil(h / float(bins)))
        kw = int(math.ceil(w / float(bins)))
        ph = int((kh * bins - h + 1) / 2)
        pw = int((kw * bins - w + 1) / 2)
        plans.append((bins, kh, kw, ph, pw))

    def apply(p, bots, rng, training, knobs=None):
        xx = bots[0]
        outs = []
        for bins, kh, kw, ph, pw in plans:
            if method == POOL_METHOD["MAX"]:
                y = op_nn.max_pool2d(xx, (kh, kw), (kh, kw), (ph, pw))
            else:
                y = op_nn.avg_pool2d(xx, (kh, kw), (kh, kw), (ph, pw))
            y = y[:, :bins, :bins, :]
            # caffe flatten order: (N, C, bins, bins) -> (N, C*bins*bins)
            outs.append(layout.to_caffe(y).reshape(y.shape[0], -1))
        return (jnp.concatenate(outs, axis=1),)

    return _base(ctx, apply, top_nhwc=[False])


def _recurrent_params(lv: View, input_dim: int, H: int, n_blobs: int):
    """Caffe recurrent weight fillers; blob shapes depend on the variant."""
    wf = lv.recurrent_param.weight_filler
    bf = lv.recurrent_param.bias_filler
    return wf, bf


@register("LSTM")
def build_lstm(ctx: BuildCtx) -> LayerImpl:
    """Caffe LSTMLayer (lstm_layer.cpp): bottoms x (T, N, D), cont (T, N)
    [, x_static (N, Ds)] [, h_0 (1, N, H), c_0 (1, N, H) when
    recurrent_param.expose_hidden]; tops y (T, N, H) [, h_T, c_T].

    Params in the reference's unrolled-net order (FillUnrolledNet,
    lstm_layer.cpp:107-145): [W_xc (4H, D), b_c (4H) [, W_xc_static
    (4H, Ds)], W_hc (4H, H)]; gate order i, f, o, g; a static bottom adds
    its transform to every timestep's gate input; cont gates both h_{t-1}
    (h_conted scale) and c_{t-1} (inside LSTMUnit).  Static-input presence
    is inferred from the bottom count like recurrent_layer.cpp:44."""
    lv = ctx.lv
    H = int(lv.recurrent_param.num_output)
    x_info = ctx.bottoms[0]
    T, N = x_info.shape_caffe[0], x_info.shape_caffe[1]
    D = int(np.prod(x_info.shape_caffe[2:]))
    expose = bool(lv.recurrent_param.expose_hidden)
    static = len(ctx.bottoms) > 2 + (2 if expose else 0)
    Ds = int(np.prod(ctx.bottoms[2].shape_caffe[1:])) if static else 0
    wf, bf = _recurrent_params(lv, D, H, 3)
    shapes = [(4 * H, D), (4 * H,)] + ([(4 * H, Ds)] if static else []) \
        + [(4 * H, H)]
    fillers = [wf, bf] + ([wf] if static else []) + [wf]
    params = []
    for i, (shp, fl) in enumerate(zip(shapes, fillers)):
        lr_i, dc_i = _param_mults(lv, i)
        params.append(ParamInfo(
            shp, (lambda s, f: lambda key: op_filler.fill(key, s, f))(shp, fl),
            (lambda s: lambda a: a.reshape(s))(shp), lambda a: a, lr_i, dc_i))

    def apply(p, bots, rng, training, knobs=None):
        if static:
            W_xc, b_c, W_xc_static, W_hc = p
        else:
            (W_xc, b_c, W_hc), W_xc_static = p, None
        x = bots[0].reshape(T, N, D).astype(jnp.float32)
        cont = bots[1].reshape(T, N).astype(jnp.float32)
        xw = jnp.einsum("tnd,gd->tng", x, W_xc) + b_c  # (T, N, 4H)
        if static:
            xs = bots[2].reshape(N, Ds).astype(jnp.float32)
            xw = xw + (xs @ W_xc_static.T)[None]
        if expose:
            h0 = bots[-2].reshape(N, H).astype(jnp.float32)
            c0 = bots[-1].reshape(N, H).astype(jnp.float32)
        else:
            h0 = c0 = jnp.zeros((N, H), jnp.float32)

        def step(carry, inp):
            h_prev, c_prev = carry
            xt, ct = inp
            h_c = h_prev * ct[:, None]
            c_c = c_prev * ct[:, None]
            gates = xt + h_c @ W_hc.T
            i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
            f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
            o = jax.nn.sigmoid(gates[:, 2 * H : 3 * H])
            g = jnp.tanh(gates[:, 3 * H : 4 * H])
            c = f * c_c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (h_T, c_T), hs = jax.lax.scan(step, (h0, c0), (xw, cont))
        out = hs.astype(bots[0].dtype)
        if expose:
            return (out, h_T.reshape(1, N, H), c_T.reshape(1, N, H))
        return (out,)

    return _base(ctx, apply, params, top_nhwc=[False] * (3 if expose else 1))


@register("RNN")
def build_rnn(ctx: BuildCtx) -> LayerImpl:
    """Caffe RNNLayer (rnn_layer.cpp): h_t = tanh(W_hh h_{t-1}*cont + W_xh x_t
    + b_h [+ W_xh_static x_static]); o_t = tanh(W_ho h_t + b_o); bottoms
    x (T, N, D), cont (T, N) [, x_static (N, Ds)] [, h_0 (1, N, H)]; params
    in the unrolled-net order (rnn_layer.cpp:93-211): [W_xh (H,D), b_h (H)
    [, W_xh_static (H,Ds)], W_hh (H,H), W_ho (H,H), b_o (H)]."""
    lv = ctx.lv
    H = int(lv.recurrent_param.num_output)
    x_info = ctx.bottoms[0]
    T, N = x_info.shape_caffe[0], x_info.shape_caffe[1]
    D = int(np.prod(x_info.shape_caffe[2:]))
    expose = bool(lv.recurrent_param.expose_hidden)
    static = len(ctx.bottoms) > 2 + (1 if expose else 0)
    Ds = int(np.prod(ctx.bottoms[2].shape_caffe[1:])) if static else 0
    wf, bf = _recurrent_params(lv, D, H, 5)
    shapes = [(H, D), (H,)] + ([(H, Ds)] if static else []) \
        + [(H, H), (H, H), (H,)]
    fillers = [wf, bf] + ([wf] if static else []) + [wf, wf, bf]
    params = []
    for i, (shp, fl) in enumerate(zip(shapes, fillers)):
        lr_i, dc_i = _param_mults(lv, i)
        params.append(ParamInfo(shp, (lambda s, f: lambda key: op_filler.fill(key, s, f))(shp, fl),
                                (lambda s: lambda a: a.reshape(s))(shp), lambda a: a, lr_i, dc_i))

    def apply(p, bots, rng, training, knobs=None):
        if static:
            W_xh, b_h, W_xh_static, W_hh, W_ho, b_o = p
        else:
            (W_xh, b_h, W_hh, W_ho, b_o), W_xh_static = p, None
        x = bots[0].reshape(T, N, D).astype(jnp.float32)
        cont = bots[1].reshape(T, N).astype(jnp.float32)
        xw = jnp.einsum("tnd,hd->tnh", x, W_xh) + b_h
        if static:
            xs = bots[2].reshape(N, Ds).astype(jnp.float32)
            xw = xw + (xs @ W_xh_static.T)[None]
        h0 = (bots[-1].reshape(N, H).astype(jnp.float32) if expose
              else jnp.zeros((N, H), jnp.float32))

        def step(h_prev, inp):
            xt, ct = inp
            h = jnp.tanh(xt + (h_prev * ct[:, None]) @ W_hh.T)
            o = jnp.tanh(h @ W_ho.T + b_o)
            return h, o

        h_T, os_ = jax.lax.scan(step, h0, (xw, cont))
        out = os_.astype(bots[0].dtype)
        if expose:
            return (out, h_T.reshape(1, N, H))
        return (out,)

    return _base(ctx, apply, params, top_nhwc=[False] * (2 if expose else 1))


@register("LSTMUnit")
def build_lstm_unit(ctx: BuildCtx) -> LayerImpl:
    """Single-timestep LSTM gate math (lstm_unit_layer.cpp:43-66).

    Bottoms: c_prev (1, N, H), gate pre-activations X (1, N, 4H) in caffe
    gate order [i, f, o, g], cont (1, N).  Tops: c, h (1, N, H).
    ``f`` is additionally scaled (and flushed) by cont."""
    ctx.require_bottoms(3)

    def apply(p, bots, rng, training, knobs=None):
        c_prev, X, cont = bots
        H = c_prev.shape[-1]
        X = X.astype(jnp.float32)
        i = jax.nn.sigmoid(X[..., :H])
        f = jax.nn.sigmoid(X[..., H : 2 * H])
        o = jax.nn.sigmoid(X[..., 2 * H : 3 * H])
        g = jnp.tanh(X[..., 3 * H :])
        cont_b = cont.reshape(cont.shape[0], cont.shape[1], 1).astype(jnp.float32)
        c = cont_b * f * c_prev.astype(jnp.float32) + i * g
        h = o * jnp.tanh(c)
        return (c.astype(c_prev.dtype), h.astype(c_prev.dtype))

    return _base(ctx, apply, top_nhwc=[False, False])


@register("Filter")
def build_filter(ctx: BuildCtx) -> LayerImpl:
    """Filter (filter_layer.cpp): last bottom is a per-item selector; each
    other bottom is filtered along axis 0 keeping items whose selector != 0.

    The reference's output batch is data-dependent, which XLA's static-shape
    model cannot express inside one compiled program.  TPU-native semantics:
    kept rows are compacted to the FRONT in original order, the tail is
    zero-filled, and the static output batch equals the input batch (the
    reference's upper bound).  The kept count is ``sum(selector != 0)``
    (recoverable by the consumer from the selector blob)."""

    def apply(p, bots, rng, training, knobs=None):
        sel = bots[-1].reshape(bots[-1].shape[0], -1)[:, 0]
        keep = sel != 0
        n = keep.shape[0]
        # stable compaction: kept items keep their relative order at the
        # front; dropped items are packed after them
        k = jnp.sum(keep)
        order = jnp.where(keep, jnp.cumsum(keep) - 1, k + jnp.cumsum(~keep) - 1)
        idx = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        valid = jnp.arange(n) < jnp.sum(keep)
        outs = []
        for b in bots[:-1]:
            g = jnp.take(b, idx, axis=0)
            mask = valid.reshape((n,) + (1,) * (b.ndim - 1))
            outs.append(jnp.where(mask, g, jnp.zeros_like(g)))
        return tuple(outs)

    return _base(ctx, apply)


class _PyBlob:
    """numpy-backed blob shim handed to user Python layers (pycaffe
    python_layer.hpp semantics: .data/.diff views, .shape, .reshape)."""

    def __init__(self, arr: np.ndarray):
        self.data = np.array(arr, np.float32)
        self.diff = np.zeros_like(self.data)

    @property
    def shape(self):
        return self.data.shape

    def reshape(self, *shape):
        self.data = np.zeros(shape, np.float32)
        self.diff = np.zeros(shape, np.float32)

    def count(self):
        return self.data.size


@register("Python")
def build_python(ctx: BuildCtx) -> LayerImpl:
    """'Python' layer (python_layer.hpp, _caffe.cpp Python layer factory):
    instantiate ``python_param.module``.``python_param.layer`` and drive its
    setup/reshape/forward protocol.  The user forward runs on host via
    ``jax.pure_callback`` inside the compiled program — the TPU-native
    replacement for pycaffe's boost::python re-entry."""
    pp = ctx.lv.python_param
    import importlib

    mod = importlib.import_module(pp.module)
    cls = getattr(mod, pp.layer)
    inst = cls()
    inst.param_str = pp.param_str
    # pycaffe sets .phase on Python layers (python_layer.hpp phase_;
    # caffe.TRAIN == 0, caffe.TEST == 1)
    inst.phase = 0 if ctx.phase == "TRAIN" else 1

    caffe_bots = []
    for bi in ctx.bottoms:
        caffe_bots.append(_PyBlob(np.zeros(bi.shape_caffe, np.float32)))
    n_tops = len(ctx.lv.top)
    caffe_tops = [_PyBlob(np.zeros((1,), np.float32)) for _ in range(n_tops)]
    if hasattr(inst, "setup"):
        inst.setup(caffe_bots, caffe_tops)
    if hasattr(inst, "reshape"):
        inst.reshape(caffe_bots, caffe_tops)
    top_shapes = [t.data.shape for t in caffe_tops]
    bot_nhwc = [bi.nhwc for bi in ctx.bottoms]
    lock = __import__("threading").Lock()

    def host_forward(*arrays):
        with lock:  # user layer instances are stateful
            for blob, arr in zip(caffe_bots, arrays):
                blob.data = np.asarray(arr, np.float32)
            inst.forward(caffe_bots, caffe_tops)
            return tuple(np.asarray(t.data, np.float32) for t in caffe_tops)

    def host_backward(bot_arrays, top_diffs):
        """Re-run forward for state, then the user's backward protocol
        (python_layer.hpp: backward(top, propagate_down, bottom) fills
        bottom[i].diff)."""
        with lock:
            for blob, arr in zip(caffe_bots, bot_arrays):
                blob.data = np.asarray(arr, np.float32)
            inst.forward(caffe_bots, caffe_tops)
            for blob, d in zip(caffe_tops, top_diffs):
                blob.diff = np.asarray(d, np.float32)
            if hasattr(inst, "backward"):
                inst.backward(caffe_tops, [True] * len(caffe_bots), caffe_bots)
                return tuple(np.asarray(b.diff, np.float32) for b in caffe_bots)
            return tuple(np.zeros_like(b.data) for b in caffe_bots)

    @jax.custom_vjp
    def py_call(*caffe_in):
        result_shapes = tuple(
            jax.ShapeDtypeStruct(s, jnp.float32) for s in top_shapes
        )
        return jax.pure_callback(host_forward, result_shapes, *caffe_in)

    def py_call_fwd(*caffe_in):
        return py_call(*caffe_in), caffe_in

    def py_call_bwd(caffe_in, top_diffs):
        diff_shapes = tuple(
            jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in caffe_in
        )
        return jax.pure_callback(host_backward, diff_shapes, caffe_in, top_diffs)

    py_call.defvjp(py_call_fwd, py_call_bwd)

    def apply(p, bots, rng, training, knobs=None):
        caffe_in = []
        for b, is_nhwc in zip(bots, bot_nhwc):
            caffe_in.append(layout.to_caffe(b) if (is_nhwc and b.ndim == 4) else b)
        caffe_in = [b.astype(jnp.float32) for b in caffe_in]
        outs = py_call(*caffe_in)
        final = []
        for o in outs:
            final.append(layout.to_physical(o) if o.ndim == 4 else o)
        return tuple(final)

    return _base(
        ctx, apply,
        top_nhwc=[len(s) == 4 for s in top_shapes],
    )
