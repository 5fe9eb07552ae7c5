"""Layer registry: Caffe layer type -> TPU-native builder.

The graph runtime (core.net.Net) calls ``build(ctx)`` per prototxt layer; the
builder returns a :class:`LayerImpl` whose ``apply`` is a pure jax-traceable
function over physical-layout arrays.  This replaces Caffe's virtual
``Layer::Forward_gpu`` dispatch (reference include/caffe/layer.hpp) with a
build-time specialization: all shape/axis decisions happen once per net
construction, so the traced program has static shapes and no interpreter
overhead.

Layout contract: 4-D activations are physical NHWC (see ops.layout); caffe
parameter blobs keep their caffe-layout shapes in ``ParamInfo.caffe_shape``
and are transposed to internal layout on import (conv OIHW -> HWIO etc.).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import elementwise as ew
from ..ops import imresize as op_imresize
from ..ops import layout
from ..ops import losses as op_losses
from ..ops import nms as op_nms
from ..ops import nn as op_nn
from ..proto.caffe_pb import ELTWISE_OP, HINGE_NORM, LOSS_NORMALIZATION, NORM_REGION, POOL_METHOD, View
from . import filler as op_filler


@dataclass
class BlobInfo:
    """Static metadata the runtime tracks per blob."""

    shape_physical: Tuple[int, ...]
    nhwc: bool  # True if 4-D NHWC physical layout

    @property
    def shape_caffe(self) -> Tuple[int, ...]:
        if self.nhwc:
            n, h, w, c = self.shape_physical
            return (n, c, h, w)
        return self.shape_physical

    @property
    def ndim(self) -> int:
        return len(self.shape_physical)


@dataclass
class ParamInfo:
    caffe_shape: Tuple[int, ...]
    init: Callable[[jax.Array], jax.Array]  # key -> internal array
    import_caffe: Callable[[np.ndarray], np.ndarray]  # caffe array -> internal
    export_caffe: Callable[[np.ndarray], np.ndarray]  # internal -> caffe array
    lr_mult: float = 1.0
    decay_mult: float = 1.0


@dataclass
class LayerImpl:
    name: str
    type: str
    bottoms: List[str]
    tops: List[str]
    apply: Callable[..., Tuple[jax.Array, ...]]  # (params, bottoms, rng, training) -> tops
    params: List[ParamInfo] = field(default_factory=list)
    loss_weights: List[float] = field(default_factory=list)
    top_nhwc: Optional[List[bool]] = None  # None = infer: 4-D outputs are NHWC
    needs_rng: bool = False  # true -> Net splits a fresh PRNG key per forward
    # stat-carrying layers (BatchNorm in TRAIN): like `apply` but returns
    # (tops, aux); Net collects aux per layer when the caller asks for it
    aux_apply: Optional[Callable[..., Tuple[Tuple[jax.Array, ...], Any]]] = None
    meta: Dict[str, Any] = field(default_factory=dict)


@dataclass
class BuildCtx:
    lv: View  # LayerParameter view
    bottoms: List[BlobInfo]
    phase: str  # 'TRAIN' | 'TEST'

    def require_bottoms(self, n: int):
        if len(self.bottoms) != n:
            raise ValueError(f"layer {self.lv.name}: expected {n} bottoms, got {len(self.bottoms)}")


REGISTRY: Dict[str, Callable[[BuildCtx], LayerImpl]] = {}


def register(type_name: str):
    def deco(fn):
        REGISTRY[type_name] = fn
        return fn

    return deco


def _base(ctx: BuildCtx, apply, params=None, loss_weights=None, top_nhwc=None,
          needs_rng=False) -> LayerImpl:
    lv = ctx.lv
    return LayerImpl(
        name=lv.name,
        type=lv.type,
        bottoms=list(lv.bottom),
        tops=list(lv.top),
        apply=apply,
        params=params or [],
        loss_weights=loss_weights if loss_weights is not None else list(lv.loss_weight),
        top_nhwc=top_nhwc,
        needs_rng=needs_rng,
    )


def _param_mults(lv: View, idx: int) -> Tuple[float, float]:
    specs = lv.param
    if idx < len(specs):
        return float(specs[idx].lr_mult), float(specs[idx].decay_mult)
    return 1.0, 1.0


def _hw(repeated, single_h, single_w, default):
    """Resolve caffe's repeated-or-h/w conv geometry params."""
    if single_h is not None and single_w is not None and (single_h or single_w):
        return int(single_h), int(single_w)
    vals = list(repeated)
    if len(vals) == 0:
        return default, default
    if len(vals) == 1:
        return int(vals[0]), int(vals[0])
    return int(vals[0]), int(vals[1])


# --------------------------------------------------------------------- conv


@register("Convolution")
def build_convolution(ctx: BuildCtx) -> LayerImpl:
    lv, cp = ctx.lv, ctx.lv.convolution_param
    x = ctx.bottoms[0]
    if not x.nhwc:
        raise ValueError(f"{lv.name}: Convolution expects 4-D input")
    cin = x.shape_physical[3]
    cout = int(cp.num_output)
    kh, kw = _hw(cp.kernel_size, cp.kernel_h if cp.has("kernel_h") else None,
                 cp.kernel_w if cp.has("kernel_w") else None, None)
    if kh is None:
        raise ValueError(f"{lv.name}: kernel size unset")
    sh, sw = _hw(cp.stride, cp.stride_h if cp.has("stride_h") else None,
                 cp.stride_w if cp.has("stride_w") else None, 1)
    ph, pw = _hw(cp.pad, cp.pad_h if cp.has("pad_h") or cp.pad_h else None,
                 cp.pad_w if cp.has("pad_w") or cp.pad_w else None, 0)
    dil = list(cp.dilation)
    dh = dw = int(dil[0]) if len(dil) == 1 else 1
    if len(dil) == 2:
        dh, dw = int(dil[0]), int(dil[1])
    groups = int(cp.group)
    bias = bool(cp.bias_term)

    w_caffe_shape = (cout, cin // groups, kh, kw)
    wf, bf = cp.weight_filler, cp.bias_filler

    def w_import(a):
        return np.transpose(a, (2, 3, 1, 0))  # OIHW -> HWIO

    def w_export(a):
        return np.transpose(a, (3, 2, 0, 1))

    lr0, dc0 = _param_mults(lv, 0)
    params = [
        ParamInfo(
            caffe_shape=w_caffe_shape,
            init=lambda key: jnp.transpose(op_filler.fill(key, w_caffe_shape, wf), (2, 3, 1, 0)),
            import_caffe=w_import,
            export_caffe=w_export,
            lr_mult=lr0,
            decay_mult=dc0,
        )
    ]
    if bias:
        lr1, dc1 = _param_mults(lv, 1)
        params.append(
            ParamInfo(
                caffe_shape=(cout,),
                init=lambda key: op_filler.fill(key, (cout,), bf),
                import_caffe=lambda a: a.reshape(cout),
                export_caffe=lambda a: a,
                lr_mult=lr1,
                decay_mult=dc1,
            )
        )

    def apply(p, bots, rng, training, knobs=None):
        w = p[0]
        b = p[1] if bias else None
        return (op_nn.conv2d(bots[0], w, b, stride=(sh, sw), pad=(ph, pw),
                             dilation=(dh, dw), groups=groups),)

    return _base(ctx, apply, params)


@register("Deconvolution")
def build_deconvolution(ctx: BuildCtx) -> LayerImpl:
    lv, cp = ctx.lv, ctx.lv.convolution_param
    x = ctx.bottoms[0]
    cin = x.shape_physical[3]
    cout = int(cp.num_output)
    kh, kw = _hw(cp.kernel_size, cp.kernel_h if cp.has("kernel_h") else None,
                 cp.kernel_w if cp.has("kernel_w") else None, None)
    sh, sw = _hw(cp.stride, cp.stride_h if cp.has("stride_h") else None,
                 cp.stride_w if cp.has("stride_w") else None, 1)
    ph, pw = _hw(cp.pad, cp.pad_h if cp.has("pad_h") or cp.pad_h else None,
                 cp.pad_w if cp.has("pad_w") or cp.pad_w else None, 0)
    groups = int(cp.group)
    bias = bool(cp.bias_term)
    # caffe deconv blob: (Cin, Cout/groups, kh, kw)
    w_caffe_shape = (cin, cout // groups, kh, kw)
    wf, bf = cp.weight_filler, cp.bias_filler

    cin_g, cout_g = cin // groups, cout // groups

    def w_import(a):
        # equivalent direct grouped-conv kernel: HWIO with I=Cin/g and
        # O=Cout (group-major), spatially flipped.  Caffe's deconv blob is
        # (Cin, Cout/g, kh, kw) with the group indexed by Cin-major blocks.
        a5 = np.asarray(a).reshape(groups, cin_g, cout_g, kh, kw)
        w = np.transpose(a5, (3, 4, 1, 0, 2)).reshape(kh, kw, cin_g, cout)
        return w[::-1, ::-1]

    def w_export(a):
        w = np.asarray(a)[::-1, ::-1].reshape(kh, kw, cin_g, groups, cout_g)
        return np.transpose(w, (3, 2, 4, 0, 1)).reshape(cin, cout_g, kh, kw)

    lr0, dc0 = _param_mults(lv, 0)
    params = [
        ParamInfo(
            caffe_shape=w_caffe_shape,
            init=lambda key: jnp.asarray(w_import(np.asarray(op_filler.fill(key, w_caffe_shape, wf)))),
            import_caffe=w_import,
            export_caffe=w_export,
            lr_mult=lr0,
            decay_mult=dc0,
        )
    ]
    if bias:
        lr1, dc1 = _param_mults(lv, 1)
        params.append(
            ParamInfo((cout,), lambda key: op_filler.fill(key, (cout,), bf),
                      lambda a: a.reshape(cout), lambda a: a, lr1, dc1)
        )

    def apply(p, bots, rng, training, knobs=None):
        b = p[1] if bias else None
        return (op_nn.deconv2d(bots[0], p[0], b, stride=(sh, sw), pad=(ph, pw), groups=groups),)

    return _base(ctx, apply, params)


@register("Pooling")
def build_pooling(ctx: BuildCtx) -> LayerImpl:
    pp = ctx.lv.pooling_param
    x = ctx.bottoms[0]
    if pp.global_pooling:
        kh, kw = x.shape_physical[1], x.shape_physical[2]
        ph = pw = 0
        sh = sw = 1
    else:
        kh, kw = _hw([pp.kernel_size] if pp.has("kernel_size") else [],
                     pp.kernel_h if pp.has("kernel_h") else None,
                     pp.kernel_w if pp.has("kernel_w") else None, None)
        sh, sw = _hw([pp.stride] if pp.has("stride") else [],
                     pp.stride_h if pp.has("stride_h") else None,
                     pp.stride_w if pp.has("stride_w") else None, 1)
        ph, pw = _hw([pp.pad] if pp.has("pad") else [],
                     pp.pad_h if pp.has("pad_h") else None,
                     pp.pad_w if pp.has("pad_w") else None, 0)
    method = pp.pool
    if method == POOL_METHOD["STOCHASTIC"] and (ph or pw):
        # reference pooling_layer.cpp:36-41: padding only for AVE/MAX
        raise ValueError("Padding implemented only for average and max "
                         "pooling.")
    is_train = ctx.phase == "TRAIN"

    def apply(p, bots, rng, training, knobs=None):
        if method == POOL_METHOD["MAX"]:
            return (op_nn.max_pool2d(bots[0], (kh, kw), (sh, sw), (ph, pw)),)
        if method == POOL_METHOD["AVE"]:
            return (op_nn.avg_pool2d(bots[0], (kh, kw), (sh, sw), (ph, pw)),)
        # sample only when BOTH the build phase and the runtime flag say
        # train (like Dropout): a TRAIN-phase net applied with
        # training=False takes the weighted-average test path
        return (op_nn.stochastic_pool2d(bots[0], (kh, kw), (sh, sw), rng,
                                        is_train and training),)

    return _base(ctx, apply,
                 needs_rng=(method == POOL_METHOD["STOCHASTIC"] and is_train))


@register("InnerProduct")
def build_inner_product(ctx: BuildCtx) -> LayerImpl:
    lv, ip = ctx.lv, ctx.lv.inner_product_param
    x = ctx.bottoms[0]
    caffe_shape_in = x.shape_caffe
    axis = ip.axis if ip.axis >= 0 else ip.axis + len(caffe_shape_in)
    M = int(np.prod(caffe_shape_in[:axis])) if axis > 0 else 1
    K = int(np.prod(caffe_shape_in[axis:]))
    N = int(ip.num_output)
    transpose = bool(ip.transpose)
    bias = bool(ip.bias_term)
    w_caffe_shape = (K, N) if transpose else (N, K)
    wf, bf = ip.weight_filler, ip.bias_filler
    nhwc_in = x.nhwc

    def w_import(a):
        return a if transpose else a.T  # internal: (K, N)

    def w_export(a):
        return a if transpose else np.asarray(a).T

    lr0, dc0 = _param_mults(lv, 0)
    params = [
        ParamInfo(w_caffe_shape,
                  lambda key: jnp.asarray(op_filler.fill(key, w_caffe_shape, wf)).T
                  if not transpose else op_filler.fill(key, w_caffe_shape, wf),
                  w_import, w_export, lr0, dc0)
    ]
    if bias:
        lr1, dc1 = _param_mults(lv, 1)
        params.append(ParamInfo((N,), lambda key: op_filler.fill(key, (N,), bf),
                                lambda a: a.reshape(N), lambda a: a, lr1, dc1))

    def apply(p, bots, rng, training, knobs=None):
        xx = bots[0]
        if nhwc_in:
            xx = layout.to_caffe(xx)  # flatten in caffe memory order
        x2d = xx.reshape(M, K)
        y = op_nn.inner_product(x2d, p[0], p[1] if bias else None)
        out_shape = caffe_shape_in[:axis] + (N,)
        return (y.reshape(out_shape),)

    return _base(ctx, apply, params, top_nhwc=[False])


# ------------------------------------------------------------- activations


def _simple(ctx: BuildCtx, fn) -> LayerImpl:
    def apply(p, bots, rng, training, knobs=None):
        return (fn(bots[0]),)

    return _base(ctx, apply)


@register("ReLU")
def build_relu(ctx: BuildCtx) -> LayerImpl:
    slope = float(ctx.lv.relu_param.negative_slope)
    return _simple(ctx, lambda x: ew.relu(x, slope))


@register("Sigmoid")
def build_sigmoid(ctx):
    return _simple(ctx, ew.sigmoid)


@register("TanH")
def build_tanh(ctx):
    return _simple(ctx, ew.tanh)


@register("AbsVal")
def build_absval(ctx):
    return _simple(ctx, ew.absval)


@register("BNLL")
def build_bnll(ctx):
    return _simple(ctx, ew.bnll)


@register("ELU")
def build_elu(ctx):
    alpha = float(ctx.lv.elu_param.alpha)
    return _simple(ctx, lambda x: ew.elu(x, alpha))


@register("Power")
def build_power(ctx):
    pp = ctx.lv.power_param
    return _simple(ctx, lambda x: ew.power(x, float(pp.power), float(pp.scale), float(pp.shift)))


@register("Exp")
def build_exp(ctx):
    pp = ctx.lv.exp_param
    return _simple(ctx, lambda x: ew.exp(x, float(pp.base), float(pp.scale), float(pp.shift)))


@register("Log")
def build_log(ctx):
    pp = ctx.lv.log_param
    return _simple(ctx, lambda x: ew.log(x, float(pp.base), float(pp.scale), float(pp.shift)))


@register("Threshold")
def build_threshold(ctx):
    t = float(ctx.lv.threshold_param.threshold)
    return _simple(ctx, lambda x: ew.threshold(x, t))


@register("PReLU")
def build_prelu(ctx: BuildCtx) -> LayerImpl:
    lv = ctx.lv
    pp = lv.prelu_param
    x = ctx.bottoms[0]
    channels = x.shape_caffe[1]
    shared = bool(pp.channel_shared)
    n_slopes = 1 if shared else channels
    channel_axis = 3 if x.nhwc else (1 if x.ndim > 1 else 0)
    fl = pp.filler if pp.has("filler") else View({"type": "constant", "value": 0.25}, "FillerParameter")
    lr0, dc0 = _param_mults(lv, 0)
    params = [ParamInfo((n_slopes,), lambda key: op_filler.fill(key, (n_slopes,), fl),
                        lambda a: a.reshape(n_slopes), lambda a: a, lr0, dc0)]

    def apply(p, bots, rng, training, knobs=None):
        return (ew.prelu(bots[0], p[0], channel_axis),)

    return _base(ctx, apply, params)


@register("Dropout")
def build_dropout(ctx: BuildCtx) -> LayerImpl:
    ratio = float(ctx.lv.dropout_param.dropout_ratio)
    training = ctx.phase == "TRAIN"

    def apply(p, bots, rng, training_rt, knobs=None):
        if not training:
            return (bots[0],)
        return (ew.dropout(bots[0], ratio, rng, True),)

    return _base(ctx, apply)


# ----------------------------------------------------------- normalization


@register("LRN")
def build_lrn(ctx: BuildCtx) -> LayerImpl:
    pp = ctx.lv.lrn_param
    size = int(pp.local_size)
    alpha, beta, k = float(pp.alpha), float(pp.beta), float(pp.k)
    region = pp.norm_region

    def apply(p, bots, rng, training, knobs=None):
        if region == NORM_REGION["ACROSS_CHANNELS"]:
            return (op_nn.lrn_across_channels(bots[0], size, alpha, beta, k),)
        return (op_nn.lrn_within_channel(bots[0], size, alpha, beta, k),)

    return _base(ctx, apply)


@register("BatchNorm")
def build_batch_norm(ctx: BuildCtx) -> LayerImpl:
    lv, bp = ctx.lv, ctx.lv.batch_norm_param
    x = ctx.bottoms[0]
    c = x.shape_caffe[1]
    eps = float(bp.eps)
    use_global = bp.use_global_stats if bp.has("use_global_stats") else (ctx.phase == "TEST")
    channel_axis = 3 if x.nhwc else 1
    # three non-learnable blobs: mean, variance, scale factor
    params = [
        ParamInfo((c,), lambda key: jnp.zeros((c,), jnp.float32), lambda a: a.reshape(c), lambda a: a, 0.0, 0.0),
        ParamInfo((c,), lambda key: jnp.zeros((c,), jnp.float32), lambda a: a.reshape(c), lambda a: a, 0.0, 0.0),
        ParamInfo((1,), lambda key: jnp.zeros((1,), jnp.float32), lambda a: a.reshape(1), lambda a: a, 0.0, 0.0),
    ]

    def apply(p, bots, rng, training, knobs=None):
        if use_global:
            return (op_nn.batch_norm_inference(bots[0], p[0], p[1], p[2][0], eps, channel_axis),)
        y, _, _ = op_nn.batch_norm_training(bots[0], eps, channel_axis)
        return (y,)

    impl = _base(ctx, apply, params)
    if not use_global:
        # TRAIN: surface the batch stats so the solver can roll the running
        # averages exactly like the reference's in-Forward mutation
        # (batch_norm_layer.cpp:120-136) — see Solver._bn_update
        def aux_apply(p, bots, rng, training, knobs=None):
            y, mu, var = op_nn.batch_norm_training(bots[0], eps, channel_axis)
            return (y,), (mu, var)

        impl.aux_apply = aux_apply
        impl.meta["bn_maf"] = float(bp.moving_average_fraction)
        # per-channel element count m = N*H*W (static shapes)
        impl.meta["bn_m"] = int(np.prod(
            [d for i, d in enumerate(x.shape_caffe) if i != 1]))
    return impl


@register("Scale")
def build_scale(ctx: BuildCtx) -> LayerImpl:
    lv, sp = ctx.lv, ctx.lv.scale_param
    x = ctx.bottoms[0]
    two_bottoms = len(ctx.bottoms) == 2
    axis = sp.axis if sp.axis >= 0 else sp.axis + x.ndim
    num_axes = sp.num_axes
    bias = bool(sp.bias_term)
    caffe_shape = x.shape_caffe

    if two_bottoms:
        gshape = ctx.bottoms[1].shape_caffe
        params: List[ParamInfo] = []
    else:
        gshape = tuple(caffe_shape[axis : axis + num_axes]) if num_axes >= 0 else tuple(caffe_shape[axis:])
        fl = sp.filler if sp.has("filler") else View({"type": "constant", "value": 1.0}, "FillerParameter")
        lr0, dc0 = _param_mults(lv, 0)
        params = [ParamInfo(gshape, lambda key: op_filler.fill(key, gshape, fl),
                            lambda a: a.reshape(gshape), lambda a: a, lr0, dc0)]
    if bias:
        bfl = sp.bias_filler if sp.has("bias_filler") else View({"type": "constant", "value": 0.0}, "FillerParameter")
        lr1, dc1 = _param_mults(lv, 1)
        params.append(ParamInfo(gshape, lambda key: op_filler.fill(key, gshape, bfl),
                                lambda a: a.reshape(gshape), lambda a: a, lr1, dc1))
    nhwc = x.nhwc

    def apply(p, bots, rng, training, knobs=None):
        xx = bots[0]
        if nhwc:
            xx = layout.to_caffe(xx)
        if two_bottoms:
            g = bots[1]
            if ctx.bottoms[1].nhwc:
                g = layout.to_caffe(g)
            bparam = p[0] if bias else None
        else:
            g = p[0]
            bparam = p[1] if bias else None
        y = ew.scale_op(xx, g, bparam, axis, len(gshape))
        if nhwc:
            y = layout.to_physical(y)
        return (y,)

    return _base(ctx, apply, params)


@register("Bias")
def build_bias(ctx: BuildCtx) -> LayerImpl:
    lv, bp = ctx.lv, ctx.lv.bias_param
    x = ctx.bottoms[0]
    two_bottoms = len(ctx.bottoms) == 2
    axis = bp.axis if bp.axis >= 0 else bp.axis + x.ndim
    num_axes = bp.num_axes
    caffe_shape = x.shape_caffe
    if two_bottoms:
        gshape = ctx.bottoms[1].shape_caffe
        params = []
    else:
        gshape = tuple(caffe_shape[axis : axis + num_axes]) if num_axes >= 0 else tuple(caffe_shape[axis:])
        fl = bp.filler if bp.has("filler") else View({"type": "constant", "value": 0.0}, "FillerParameter")
        lr0, dc0 = _param_mults(lv, 0)
        params = [ParamInfo(gshape, lambda key: op_filler.fill(key, gshape, fl),
                            lambda a: a.reshape(gshape), lambda a: a, lr0, dc0)]
    nhwc = x.nhwc

    def apply(p, bots, rng, training, knobs=None):
        xx = bots[0]
        if nhwc:
            xx = layout.to_caffe(xx)
        g = (layout.to_caffe(bots[1]) if ctx.bottoms[1].nhwc else bots[1]) if two_bottoms else p[0]
        shape = [1] * xx.ndim
        for i, d in enumerate(g.shape):
            shape[axis + i] = d
        y = xx + g.reshape(shape)
        if nhwc:
            y = layout.to_physical(y)
        return (y,)

    return _base(ctx, apply, params)


@register("MVN")
def build_mvn(ctx: BuildCtx) -> LayerImpl:
    pp = ctx.lv.mvn_param
    nv, ac, eps = bool(pp.normalize_variance), bool(pp.across_channels), float(pp.eps)
    x = ctx.bottoms[0]
    nhwc = x.nhwc

    def apply(p, bots, rng, training, knobs=None):
        xx = layout.to_caffe(bots[0]) if nhwc else bots[0]
        y = op_nn.mvn(xx, nv, ac, eps, xx.ndim)
        return (layout.to_physical(y) if nhwc else y,)

    return _base(ctx, apply)


# -------------------------------------------------------------- shape ops


@register("Concat")
def build_concat(ctx: BuildCtx) -> LayerImpl:
    cp = ctx.lv.concat_param
    x = ctx.bottoms[0]
    axis_caffe = cp.axis if cp.has("axis") or not cp.has("concat_dim") else int(cp.concat_dim)
    if axis_caffe < 0:
        axis_caffe += x.ndim
    phys_axis = layout.caffe_axis_to_physical(x.ndim, axis_caffe) if x.nhwc else axis_caffe

    def apply(p, bots, rng, training, knobs=None):
        return (jnp.concatenate(bots, axis=phys_axis),)

    return _base(ctx, apply)


@register("Slice")
def build_slice(ctx: BuildCtx) -> LayerImpl:
    sp = ctx.lv.slice_param
    x = ctx.bottoms[0]
    axis_caffe = sp.axis
    if axis_caffe < 0:
        axis_caffe += x.ndim
    phys_axis = layout.caffe_axis_to_physical(x.ndim, axis_caffe) if x.nhwc else axis_caffe
    total = x.shape_physical[phys_axis]
    n_tops = len(ctx.lv.top)
    points = [int(q) for q in sp.slice_point]
    if not points:
        step = total // n_tops
        points = [step * (i + 1) for i in range(n_tops - 1)]
    bounds = [0] + points + [total]

    def apply(p, bots, rng, training, knobs=None):
        outs = []
        for i in range(n_tops):
            sl = [slice(None)] * len(bots[0].shape)
            sl[phys_axis] = slice(bounds[i], bounds[i + 1])
            outs.append(bots[0][tuple(sl)])
        return tuple(outs)

    return _base(ctx, apply)


@register("Split")
def build_split(ctx: BuildCtx) -> LayerImpl:
    n = len(ctx.lv.top)

    def apply(p, bots, rng, training, knobs=None):
        return tuple(bots[0] for _ in range(n))

    return _base(ctx, apply)


@register("Silence")
def build_silence(ctx: BuildCtx) -> LayerImpl:
    def apply(p, bots, rng, training, knobs=None):
        return ()

    return _base(ctx, apply)


@register("Flatten")
def build_flatten(ctx: BuildCtx) -> LayerImpl:
    fp = ctx.lv.flatten_param
    x = ctx.bottoms[0]
    nd = x.ndim
    axis = fp.axis if fp.axis >= 0 else fp.axis + nd
    end_axis = fp.end_axis if fp.end_axis >= 0 else fp.end_axis + nd
    cs = x.shape_caffe
    out_shape = cs[:axis] + (int(np.prod(cs[axis : end_axis + 1])),) + cs[end_axis + 1 :]
    nhwc = x.nhwc

    def apply(p, bots, rng, training, knobs=None):
        xx = layout.to_caffe(bots[0]) if nhwc else bots[0]
        y = xx.reshape(out_shape)
        return (layout.to_physical(y) if len(out_shape) == 4 else y,)

    return _base(ctx, apply)


@register("Reshape")
def build_reshape(ctx: BuildCtx) -> LayerImpl:
    rp = ctx.lv.reshape_param
    x = ctx.bottoms[0]
    cs = x.shape_caffe
    axis = rp.axis if rp.axis >= 0 else rp.axis + x.ndim
    num_axes = rp.num_axes
    end = x.ndim if num_axes == -1 else axis + num_axes
    spec = [int(d) for d in rp.shape.dim]
    mid: List[int] = []
    for i, d in enumerate(spec):
        if d == 0:
            mid.append(cs[axis + i])
        else:
            mid.append(d)
    fixed_prod = int(np.prod([d for d in mid if d != -1]))
    src_prod = int(np.prod(cs[axis:end])) if end > axis else 1
    mid = [src_prod // max(fixed_prod, 1) if d == -1 else d for d in mid]
    out_shape = tuple(cs[:axis]) + tuple(mid) + tuple(cs[end:])
    nhwc = x.nhwc

    def apply(p, bots, rng, training, knobs=None):
        xx = layout.to_caffe(bots[0]) if nhwc else bots[0]
        y = xx.reshape(out_shape)
        return (layout.to_physical(y) if len(out_shape) == 4 else y,)

    return _base(ctx, apply)


@register("Crop")
def build_crop(ctx: BuildCtx) -> LayerImpl:
    cp = ctx.lv.crop_param
    ctx.require_bottoms(2)
    a, b = ctx.bottoms
    nd = a.ndim
    axis = cp.axis if cp.axis >= 0 else cp.axis + nd
    offsets = [int(o) for o in cp.offset]
    cs_a, cs_b = a.shape_caffe, b.shape_caffe
    starts = []
    sizes = []
    for i in range(nd):
        if i < axis:
            starts.append(0)
            sizes.append(cs_a[i])
        else:
            j = i - axis
            off = offsets[j] if j < len(offsets) else (offsets[0] if len(offsets) == 1 else 0)
            starts.append(off)
            sizes.append(cs_b[i])
    nhwc = a.nhwc

    def apply(p, bots, rng, training, knobs=None):
        xx = layout.to_caffe(bots[0]) if nhwc else bots[0]
        y = jax.lax.slice(xx, starts, [s + z for s, z in zip(starts, sizes)])
        return (layout.to_physical(y) if nd == 4 else y,)

    return _base(ctx, apply)


@register("Eltwise")
def build_eltwise(ctx: BuildCtx) -> LayerImpl:
    ep = ctx.lv.eltwise_param
    op = ep.operation
    coeffs = [float(cf) for cf in ep.coeff] or [1.0] * len(ctx.bottoms)
    if len(coeffs) != len(ctx.bottoms):
        # eltwise_layer.cpp CHECK: coeff count must match bottom count
        raise ValueError(
            f"layer {ctx.lv.name}: Eltwise takes one coefficient per bottom "
            f"({len(coeffs)} coeffs vs {len(ctx.bottoms)} bottoms)")

    def apply(p, bots, rng, training, knobs=None):
        if op == ELTWISE_OP["PROD"]:
            y = bots[0]
            for b in bots[1:]:
                y = y * b
        elif op == ELTWISE_OP["SUM"]:
            y = coeffs[0] * bots[0]
            for cf, b in zip(coeffs[1:], bots[1:]):
                y = y + cf * b
        else:  # MAX
            y = bots[0]
            for b in bots[1:]:
                y = jnp.maximum(y, b)
        return (y,)

    return _base(ctx, apply)


@register("Tile")
def build_tile(ctx: BuildCtx) -> LayerImpl:
    tp = ctx.lv.tile_param
    x = ctx.bottoms[0]
    axis = tp.axis if tp.axis >= 0 else tp.axis + x.ndim
    phys_axis = layout.caffe_axis_to_physical(x.ndim, axis) if x.nhwc else axis
    tiles = int(tp.tiles)

    def apply(p, bots, rng, training, knobs=None):
        reps = [1] * len(bots[0].shape)
        reps[phys_axis] = tiles
        return (jnp.tile(bots[0], reps),)

    return _base(ctx, apply)


@register("ArgMax")
def build_argmax(ctx: BuildCtx) -> LayerImpl:
    ap = ctx.lv.argmax_param
    x = ctx.bottoms[0]
    out_max_val = bool(ap.out_max_val)
    top_k = int(ap.top_k)
    has_axis = ap.has("axis")
    nhwc = x.nhwc
    cs = x.shape_caffe

    def apply(p, bots, rng, training, knobs=None):
        xx = layout.to_caffe(bots[0]) if nhwc else bots[0]
        if has_axis:
            axis = ap.axis if ap.axis >= 0 else ap.axis + len(cs)
            vals, idx = jax.lax.top_k(jnp.moveaxis(xx, axis, -1), top_k)
            res = vals if out_max_val else idx.astype(jnp.float32)
            return (jnp.moveaxis(res, -1, axis),)
        flat = xx.reshape(cs[0], -1)
        vals, idx = jax.lax.top_k(flat, top_k)
        if out_max_val:
            return (jnp.stack([idx.astype(jnp.float32), vals], axis=1),)
        return (idx.astype(jnp.float32)[:, None, :],)

    return _base(ctx, apply, top_nhwc=[False])


@register("Reduction")
def build_reduction(ctx: BuildCtx) -> LayerImpl:
    rp = ctx.lv.reduction_param
    from ..proto.caffe_pb import REDUCTION_OP

    op = rp.operation
    coeff = float(rp.coeff)
    x = ctx.bottoms[0]
    nd = x.ndim
    axis = rp.axis if rp.axis >= 0 else rp.axis + nd
    nhwc = x.nhwc

    def apply(p, bots, rng, training, knobs=None):
        xx = layout.to_caffe(bots[0]) if nhwc else bots[0]
        lead = xx.shape[:axis]
        flat = xx.reshape(lead + (-1,)) if axis < nd else xx.reshape(lead + (1,))
        if op == REDUCTION_OP["SUM"]:
            y = jnp.sum(flat, axis=-1)
        elif op == REDUCTION_OP["ASUM"]:
            y = jnp.sum(jnp.abs(flat), axis=-1)
        elif op == REDUCTION_OP["SUMSQ"]:
            y = jnp.sum(flat * flat, axis=-1)
        else:  # MEAN
            y = jnp.mean(flat, axis=-1)
        return (coeff * y,)

    return _base(ctx, apply, top_nhwc=[False])


@register("Softmax")
def build_softmax(ctx: BuildCtx) -> LayerImpl:
    sp = ctx.lv.softmax_param
    x = ctx.bottoms[0]
    axis = sp.axis if sp.axis >= 0 else sp.axis + x.ndim
    phys_axis = layout.caffe_axis_to_physical(x.ndim, axis) if x.nhwc else axis

    def apply(p, bots, rng, training, knobs=None):
        return (jax.nn.softmax(bots[0].astype(jnp.float32), axis=phys_axis).astype(bots[0].dtype),)

    return _base(ctx, apply)


@register("Embed")
def build_embed(ctx: BuildCtx) -> LayerImpl:
    lv, epp = ctx.lv, ctx.lv.embed_param
    N = int(epp.num_output)
    K = int(epp.input_dim)
    bias = bool(epp.bias_term)
    wf, bf = epp.weight_filler, epp.bias_filler
    lr0, dc0 = _param_mults(lv, 0)
    params = [ParamInfo((K, N), lambda key: op_filler.fill(key, (K, N), wf),
                        lambda a: a.reshape(K, N), lambda a: a, lr0, dc0)]
    if bias:
        lr1, dc1 = _param_mults(lv, 1)
        params.append(ParamInfo((N,), lambda key: op_filler.fill(key, (N,), bf),
                                lambda a: a.reshape(N), lambda a: a, lr1, dc1))

    def apply(p, bots, rng, training, knobs=None):
        idx = bots[0].astype(jnp.int32)
        y = p[0][idx]
        if bias:
            y = y + p[1]
        return (y,)

    return _base(ctx, apply, params, top_nhwc=[False])


# ------------------------------------------------------------------ losses


def _flatten_logits(x: BlobInfo):
    """(N,C,H,W) -> (N*H*W, C) flattener for softmax-family losses (caffe
    treats spatial positions as independent predictions)."""
    nhwc = x.nhwc

    def fn(arr):
        if nhwc:
            n, h, w, c = arr.shape
            return arr.reshape(n * h * w, c)
        if arr.ndim == 2:
            return arr
        return arr.reshape(arr.shape[0], -1)

    return fn


@register("SoftmaxWithLoss")
def build_softmax_loss(ctx: BuildCtx) -> LayerImpl:
    lp = ctx.lv.loss_param
    ignore = lp.ignore_label if lp.has("ignore_label") else None
    norm_names = {v: k for k, v in LOSS_NORMALIZATION.items()}
    normalization = norm_names[lp.normalization]
    if lp.has("normalize") and not lp.normalize:
        normalization = "BATCH_SIZE"
    flat = _flatten_logits(ctx.bottoms[0])
    batch_n = int(ctx.bottoms[0].shape_caffe[0])

    def apply(p, bots, rng, training, knobs=None):
        logits = flat(bots[0])
        labels = bots[1].reshape(-1)
        return (op_losses.softmax_cross_entropy(logits, labels, ignore,
                                                normalization, batch_n),)

    return _base(ctx, apply, loss_weights=list(ctx.lv.loss_weight) or [1.0], top_nhwc=[False])


@register("EuclideanLoss")
def build_euclidean_loss(ctx: BuildCtx) -> LayerImpl:
    def apply(p, bots, rng, training, knobs=None):
        return (op_losses.euclidean(bots[0], bots[1]),)

    return _base(ctx, apply, loss_weights=list(ctx.lv.loss_weight) or [1.0], top_nhwc=[False])


@register("EuclideanmaskLoss")
def build_euclidean_mask_loss(ctx: BuildCtx) -> LayerImpl:
    """CPM masked L2 loss (reference src/caffe/layers/euclideanmask_loss_layer.cpp)."""
    x = ctx.bottoms[0]
    channel_axis = 3 if x.nhwc else 1

    def apply(p, bots, rng, training, knobs=None):
        mask = bots[2]
        mask_nc = mask.reshape(mask.shape[0], -1)
        return (op_losses.euclidean_masked(bots[0], bots[1], mask_nc, channel_axis),)

    return _base(ctx, apply, loss_weights=list(ctx.lv.loss_weight) or [1.0], top_nhwc=[False])


@register("SigmoidCrossEntropyLoss")
def build_sce_loss(ctx: BuildCtx) -> LayerImpl:
    def apply(p, bots, rng, training, knobs=None):
        return (op_losses.sigmoid_cross_entropy(bots[0], bots[1]),)

    return _base(ctx, apply, loss_weights=list(ctx.lv.loss_weight) or [1.0], top_nhwc=[False])


@register("Accuracy")
def build_accuracy(ctx: BuildCtx) -> LayerImpl:
    ap = ctx.lv.accuracy_param
    top_k = int(ap.top_k)
    ignore = ap.ignore_label if ap.has("ignore_label") else None
    flat = _flatten_logits(ctx.bottoms[0])
    # optional second top: per-class accuracy (accuracy_layer.cpp:38-44)
    per_class = len(ctx.lv.top) > 1

    def apply(p, bots, rng, training, knobs=None):
        logits, labels = flat(bots[0]), bots[1].reshape(-1)
        acc = op_losses.accuracy(logits, labels, top_k, ignore)
        if per_class:
            return (acc, op_losses.accuracy_per_class(logits, labels,
                                                      top_k, ignore))
        return (acc,)

    return _base(ctx, apply, top_nhwc=[False, False] if per_class
                 else [False])


@register("HingeLoss")
def build_hinge_loss(ctx: BuildCtx) -> LayerImpl:
    norm = {v: k for k, v in HINGE_NORM.items()}[ctx.lv.hinge_loss_param.norm]
    flat = _flatten_logits(ctx.bottoms[0])

    def apply(p, bots, rng, training, knobs=None):
        return (op_losses.hinge(flat(bots[0]), bots[1].reshape(-1), norm),)

    return _base(ctx, apply, loss_weights=list(ctx.lv.loss_weight) or [1.0], top_nhwc=[False])


@register("MultinomialLogisticLoss")
def build_mll(ctx: BuildCtx) -> LayerImpl:
    flat = _flatten_logits(ctx.bottoms[0])

    def apply(p, bots, rng, training, knobs=None):
        return (op_losses.multinomial_logistic(flat(bots[0]), bots[1].reshape(-1)),)

    return _base(ctx, apply, loss_weights=list(ctx.lv.loss_weight) or [1.0], top_nhwc=[False])


@register("ContrastiveLoss")
def build_contrastive(ctx: BuildCtx) -> LayerImpl:
    cp = ctx.lv.contrastive_loss_param
    margin, legacy = float(cp.margin), bool(cp.legacy_version)

    def apply(p, bots, rng, training, knobs=None):
        a = bots[0].reshape(bots[0].shape[0], -1)
        b = bots[1].reshape(bots[1].shape[0], -1)
        return (op_losses.contrastive(a, b, bots[2], margin, legacy),)

    return _base(ctx, apply, loss_weights=list(ctx.lv.loss_weight) or [1.0], top_nhwc=[False])


# ----------------------------------------------------------- CPM specials


@register("ImResize")
def build_imresize(ctx: BuildCtx) -> LayerImpl:
    """Runtime-tunable target dims/scales come via Net.set_imresize (mirrors
    SetStartScale/SetScaleGap/setTargetDimenions, imresize_layer.hpp:23-28)."""
    ip = ctx.lv.imresize_param
    x = ctx.bottoms[0]
    s, c, h, w = x.shape_caffe
    factor = float(ip.factor)
    if factor > 0:
        th, tw = int(h * factor), int(w * factor)
    else:
        th, tw = int(ip.target_spatial_height), int(ip.target_spatial_width)
    start_scale = float(ip.start_scale)
    scale_gap = float(ip.scale_gap)

    def apply(p, bots, rng, training, knobs=None):
        return (op_imresize.imresize_average(bots[0], th, tw, start_scale, scale_gap),)

    return _base(ctx, apply)


@register("Nms")
def build_nms(ctx: BuildCtx) -> LayerImpl:
    np_ = ctx.lv.nms_param
    threshold = float(np_.threshold)
    max_peaks = int(np_.max_peaks)
    num_parts = int(np_.num_parts)

    def apply(p, bots, rng, training, knobs=None):
        x = bots[0]  # (1, H, W, C) physical
        heat = jnp.transpose(x[0], (2, 0, 1))  # (C, H, W), full channel set
        thr = threshold if not knobs or 'nms_threshold' not in knobs else knobs['nms_threshold']
        # full map so refinement reads past a channel's bottom edge land in
        # channel c+1, exactly as the reference's flat pointer arithmetic
        peaks = op_nms.nms_peaks(heat, thr, max_peaks, num_parts)
        return (peaks[None],)  # caffe shape (1, P, max_peaks+1, 3)

    return _base(ctx, apply, top_nhwc=[False])


@register("Maximum")
def build_maximum(ctx: BuildCtx) -> LayerImpl:
    """Legacy CPM head: per-channel spatial argmax -> (x, y, value)
    (reference src/caffe/layers/maximum_layer.cpp)."""
    x = ctx.bottoms[0]
    n, c, h, w = x.shape_caffe

    def apply(p, bots, rng, training, knobs=None):
        xx = bots[0]  # (N,H,W,C)
        flat = jnp.transpose(xx, (0, 3, 1, 2)).reshape(n, c, h * w)
        idx = jnp.argmax(flat, axis=-1)
        val = jnp.max(flat, axis=-1)
        px = (idx % w).astype(jnp.float32)
        py = (idx // w).astype(jnp.float32)
        # reference top shape is (n, c, 1, 3) (maximum_layer.cpp:19-21)
        return (jnp.stack([px, py, val], axis=-1).reshape(n, c, 1, 3),)

    return _base(ctx, apply, top_nhwc=[False])


# ------------------------------------------------------------ input layers


@register("Input")
def build_input(ctx: BuildCtx) -> LayerImpl:
    # handled specially by the runtime (provides graph inputs); apply is identity
    def apply(p, bots, rng, training, knobs=None):
        raise RuntimeError("Input layers are sources; the runtime binds them")

    return _base(ctx, apply)


def build(lv: View, bottoms: List[BlobInfo], phase: str) -> LayerImpl:
    t = lv.type
    if t not in REGISTRY:
        raise NotImplementedError(f"layer type {t!r} (layer {lv.name!r}) not implemented")
    return REGISTRY[t](BuildCtx(lv=lv, bottoms=bottoms, phase=phase))
