"""PoseEstimator: the flagship inference path.

One jitted XLA program runs: multi-scale CNN forward (VGG19 trunk + 6-stage
dual-branch CPM) -> fused bicubic upsample + scale averaging (ImResize) ->
peak NMS -> PAF pair scoring.  Only the tiny greedy assembly runs on host.
This collapses the reference's GPU-worker inner loop (processFrame,
rtpose.cpp:1079-1205: Net::ForwardFrom + D2H heatmap pull + CPU line
integrals) into a single device program with one small D2H transfer
(peaks + pair scores, a few hundred KB instead of the full 57xHxW heatmap).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.net import Net
from ..ops import layout
from . import connect as C
from .descriptor import ConnectParams, ModelDescriptor, for_num_parts
from .preprocess import preprocess_frame


@dataclass
class PoseResult:
    joints: np.ndarray  # (num_people, num_parts, 3) in display coords
    num_people: int
    peaks: np.ndarray  # (num_parts, max_peaks+1, 3) net coords
    heatmap: Optional[np.ndarray] = None  # (57, H, W) resized maps if requested


class PoseEstimator:
    """Build from a deploy prototxt (+ optional .caffemodel weights).

    Mirrors warmup() (rtpose.cpp:173-237): reshape input to
    (num_scales, 3, net_h, net_w), inject start_scale/scale_gap into the
    ImResize layer, auto-select the model descriptor from the Nms layer's
    num_parts, and compile.
    """

    def __init__(
        self,
        proto: str,
        weights: Optional[str] = None,
        net_resolution: Tuple[int, int] = (656, 368),  # (W, H), multiples of 16
        num_scales: int = 1,
        start_scale: float = 1.0,
        scale_gap: float = 0.3,
        dtype=jnp.float32,
        seed: int = 0,
        keep_heatmap: bool = False,
    ):
        net_w, net_h = net_resolution
        self.net_w, self.net_h = net_w, net_h
        self.num_scales = num_scales
        self.start_scale = start_scale
        self.scale_gap = scale_gap
        self.keep_heatmap = keep_heatmap

        self.net = Net(
            proto,
            phase="TEST",
            input_shapes={"image": (num_scales, 3, net_h, net_w)},
            overrides={
                "resize": {
                    "imresize_param.start_scale": start_scale,
                    "imresize_param.scale_gap": scale_gap,
                }
            },
            dtype=dtype,
            seed=seed,
        )
        if weights:
            self.net.load_weights(weights)

        nms_impl = self.net.layer_by_name.get("nms")
        if nms_impl is None:
            raise ValueError("deploy net has no 'nms' layer")
        nms_view = next(lv for lv in self.net.layer_views if lv.name == "nms")
        self.num_parts = int(nms_view.nms_param.num_parts)
        self.max_peaks = int(nms_view.nms_param.max_peaks)
        self.descriptor: ModelDescriptor = for_num_parts(self.num_parts)
        self.params_connect: ConnectParams = self.descriptor.defaults
        # heatmap blob name feeding nms (resized_map)
        self.heatmap_blob = nms_impl.bottoms[0]

        self._compiled = self._build_compiled()

    # ------------------------------------------------------------- device

    def _build_compiled(self):
        net = self.net
        desc = self.descriptor
        keep_heatmap = self.keep_heatmap
        heatmap_blob = self.heatmap_blob

        def fn(params, image_phys, nms_threshold, inter_threshold):
            knobs = {"nms_threshold": nms_threshold}
            blobs = net._apply(params, {"image": image_phys}, jax.random.PRNGKey(0), knobs, False)
            peaks = blobs["joints"][0]  # (num_parts, max_peaks+1, 3)
            hm = blobs[heatmap_blob]  # (1, H, W, C) physical
            hm_chw = jnp.transpose(hm[0], (2, 0, 1))  # (C, H, W)
            pair_score, pair_count = C.score_pairs(hm_chw, peaks, desc, inter_threshold)
            out = {"peaks": peaks, "pair_score": pair_score, "pair_count": pair_count}
            if keep_heatmap:
                out["heatmap"] = hm_chw
            return out

        return jax.jit(fn)

    def run_device(self, net_input: np.ndarray, nms_threshold=None, inter_threshold=None):
        """net_input: (S, 3, net_h, net_w) caffe layout -> device outputs."""
        p = self.params_connect
        nms_thr = jnp.float32(p.nms_threshold if nms_threshold is None else nms_threshold)
        inter_thr = jnp.float32(p.inter_threshold if inter_threshold is None else inter_threshold)
        x = layout.to_physical(jnp.asarray(net_input)).astype(self.net.dtype)
        return self._compiled(self.net.params, x, nms_thr, inter_thr)

    # --------------------------------------------------------------- host

    def estimate_from_net_input(
        self,
        net_input: np.ndarray,
        scale_xy: Tuple[float, float] = (1.0, 1.0),
        nms_threshold=None,
        params_connect: Optional[ConnectParams] = None,
    ) -> PoseResult:
        pc = params_connect or self.params_connect
        out = self.run_device(net_input, nms_threshold=nms_threshold, inter_threshold=pc.inter_threshold)
        peaks = np.asarray(jax.device_get(out["peaks"]))
        pair_score = np.asarray(jax.device_get(out["pair_score"]))
        pair_count = np.asarray(jax.device_get(out["pair_count"]))
        res = C.assemble(peaks, pair_score, pair_count, self.descriptor, pc, scale_xy)
        hm = np.asarray(jax.device_get(out["heatmap"])) if self.keep_heatmap else None
        return PoseResult(joints=res.joints, num_people=res.num_people, peaks=peaks, heatmap=hm)

    def estimate(
        self,
        frame_bgr: np.ndarray,
        disp_w: Optional[int] = None,
        disp_h: Optional[int] = None,
        **kw,
    ) -> Tuple[PoseResult, Any]:
        """Full path from a BGR frame: preprocess -> device -> assemble.
        Joint coords are scaled net->display (rtpose.cpp:1058-1060)."""
        pf = preprocess_frame(
            frame_bgr, self.net_w, self.net_h,
            disp_w=disp_w, disp_h=disp_h,
            num_scales=self.num_scales, start_scale=self.start_scale, scale_gap=self.scale_gap,
        )
        dw = disp_w if disp_w is not None else pf.display.shape[1]
        dh = disp_h if disp_h is not None else pf.display.shape[0]
        scale_xy = (dw / float(self.net_w), dh / float(self.net_h))
        result = self.estimate_from_net_input(pf.net_input, scale_xy=scale_xy, **kw)
        return result, pf
