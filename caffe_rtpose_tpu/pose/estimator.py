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

import os
import threading
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
        input_u8: bool = False,
        pair_cap: Optional[int] = None,
        batch: int = 1,
        use_pallas: Optional[bool] = None,
        pack_u8: Optional[bool] = None,
        device_rescale: bool = False,
        warm_overflow: bool = False,
    ):
        """``pair_cap``: transfer pair scores only for the first K peaks per
        part (raster order — identical to the reference for frames with
        <= K peaks/part; K=32 covers 32 people).  Shrinks the per-frame D2H
        payload ~4x (the remote-TPU fetch RTT is the realtime bottleneck).

        ``batch``: process this many frames per device program (leading axis
        on the input).  Amortizes the per-call dispatch + fetch round-trips;
        the realtime pipeline trades ~batch x one-frame latency for it
        (still far under the reference's 100 ms drop threshold).
        """
        net_w, net_h = net_resolution
        self.net_w, self.net_h = net_w, net_h
        self.num_scales = num_scales
        self.start_scale = start_scale
        self.scale_gap = scale_gap
        self.keep_heatmap = keep_heatmap
        self.input_u8 = input_u8 and not keep_heatmap
        # scale-sublinear upload: ship only each scale's live region and
        # rebuild the padded canvases on device (bit-identical; default on
        # for multi-scale u8, where the padding bytes are ~43% of the
        # reference 3-scale payload on the H2D link)
        # opt-in divergence: upload ONE largest-scale live region and derive
        # smaller scales on device with INTER_AREA matmuls (multi-scale at
        # single-scale upload bytes; pixels differ by resize-of-a-resize
        # rounding — see preprocess.make_net_input_u8_base)
        self.device_rescale = bool(device_rescale)
        if self.device_rescale and not self.input_u8:
            raise ValueError("device_rescale requires input_u8")
        if pack_u8 is None:
            pack_u8 = self.input_u8 and num_scales > 1
        self.pack_u8 = (bool(pack_u8) and self.input_u8
                        and not self.device_rescale)
        self.batch = int(batch)
        self._pair_cap = pair_cap
        if use_pallas is None:
            # ops/nms_pallas.peak_mask_fused is bit-exact vs the XLA chain
            # (verified packed-output-identical on v5e) and ~0.1 ms/frame
            # faster because the (P, th, tw) f32 heat map is never
            # materialized — default ON where there's a real TPU.  On CPU it
            # would run in interpret mode (orders of magnitude slower), so
            # the default stays off there; CRT_USE_PALLAS=1/0 forces either.
            env = os.environ.get("CRT_USE_PALLAS", "")
            if env in ("0", "1"):
                use_pallas = env == "1"
            else:
                use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = bool(use_pallas)

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
        if self._pair_cap is not None and int(self._pair_cap) < 1:
            raise ValueError("pair_cap must be a positive peak count")
        self.eff_peaks = (min(int(self._pair_cap), self.max_peaks)
                          if self._pair_cap else self.max_peaks)
        self.descriptor: ModelDescriptor = for_num_parts(self.num_parts)
        self.params_connect: ConnectParams = self.descriptor.defaults
        # heatmap blob name feeding nms (resized_map) and its low-res source
        self.heatmap_blob = nms_impl.bottoms[0]
        resize_impl = self.net.layer_by_name.get("resize")
        self.lowres_blob = resize_impl.bottoms[0] if resize_impl is not None else None

        self._compiled = self._build_compiled()
        self._nocap_lock = threading.Lock()
        self._compiled_nocap = None
        if warm_overflow and self.eff_peaks < self.max_peaks:
            # realtime mode: compile + run the uncapped overflow program in
            # the background NOW, so the first crowded frame pays one extra
            # device pass instead of a blocking multi-second XLA compile
            # mid-stream (which would age every queued frame past the 0.1 s
            # drop threshold)
            threading.Thread(target=self._warm_nocap, daemon=True).start()

    def _warm_nocap(self):
        try:
            x = np.zeros(self.input_shape(), self.input_dtype)
            jax.block_until_ready(self.run_device(
                x, _compiled=self._nocap_compiled()))
        except Exception:  # noqa: BLE001 — warmup is best-effort; a real
            pass           # failure resurfaces on the refetch path

    # ------------------------------------------------------------- device

    def _build_compiled(self, eff_peaks: Optional[int] = None,
                        batch: Optional[int] = None):
        """Fused device program.

        Optimized pipeline (the default when the graph has the standard
        resize->nms structure): run the CNN to the low-res concat, bicubically
        upsample ONLY the part channels for NMS (the PAF channels are sampled
        at full-res coordinates directly from the low-res maps via the exact
        matmul form — see connect.score_pairs_lowres), then score all limb
        candidates on device.  Mathematically identical to running the
        reference's ImResize+Nms+line-integral chain, several times cheaper on
        TPU (no 57-channel upsample, no scalarized gathers).
        """
        net = self.net
        desc = self.descriptor
        keep_heatmap = self.keep_heatmap
        heatmap_blob = self.heatmap_blob
        num_parts, max_peaks = self.num_parts, self.max_peaks
        is_default = eff_peaks is None and batch is None
        eff_peaks = self.eff_peaks if eff_peaks is None else int(eff_peaks)
        batch = self.batch if batch is None else int(batch)
        use_pallas = self.use_pallas
        pallas_interpret = jax.default_backend() != "tpu"
        start_scale, scale_gap = self.start_scale, self.scale_gap

        from ..ops.imresize import imresize_average
        from ..ops.nms import nms_peaks, refined_peaks_lowres

        input_u8 = self.input_u8
        num_scales = self.num_scales
        net_w, net_h = self.net_w, self.net_h
        if self.lowres_blob is not None and not keep_heatmap:
            impls = net.prune_for([self.lowres_blob])
            low_info = net.blob_infos[self.lowres_blob]
            s, h, w = low_info.shape_physical[0], low_info.shape_physical[1], low_info.shape_physical[2]
            rv = next(lv for lv in net.layer_views if lv.name == "resize")
            factor = float(rv.imresize_param.factor)
            if factor > 0:
                th, tw = int(h * factor), int(w * factor)
            else:
                th = int(rv.imresize_param.target_spatial_height)
                tw = int(rv.imresize_param.target_spatial_width)
            lowres_blob = self.lowres_blob

            pack_u8 = self.pack_u8
            device_rescale = self.device_rescale
            if device_rescale:
                from .preprocess import area_axis_matrix, packed_regions

                dr_regs, _ = packed_regions(
                    net_w, net_h, num_scales, start_scale, scale_gap)
                th0, tw0 = dr_regs[0][0], dr_regs[0][1]
                dr_mats = []  # per smaller scale: (Wy (thn,th0), Wx (twn,tw0))
                for rh, rw, _, _, _ in dr_regs[1:]:
                    dr_mats.append((jnp.asarray(area_axis_matrix(rh, th0)),
                                    jnp.asarray(area_axis_matrix(rw, tw0))))
            if input_u8 and not pack_u8 and not device_rescale:
                from .preprocess import region_boxes

                mask = np.zeros((num_scales, net_h, net_w, 1), np.float32)
                for i, (y0, y1, x0, x1) in enumerate(
                    region_boxes(net_w, net_h, num_scales, start_scale, scale_gap)
                ):
                    mask[i, y0:y1, x0:x1] = 1.0
            if pack_u8:
                from .preprocess import packed_regions

                pack_regs, _ = packed_regions(
                    net_w, net_h, num_scales, start_scale, scale_gap)

            def fn(params, image_phys, nms_threshold, inter_threshold):
                if device_rescale:
                    # one uploaded live region -> all scale canvases on
                    # device.  Normalize first: the INTER_AREA matrices'
                    # rows sum to 1, so resize commutes with the affine
                    # u8/256-0.5 map and padding stays exactly 0.
                    base = (image_phys.astype(jnp.float32)
                            .reshape(th0, tw0, 3) / 256.0 - 0.5)
                    canvases = []
                    for (rh, rw, padh, padw, _), mats in zip(
                            dr_regs, [None] + dr_mats):
                        xf = base if mats is None else jnp.einsum(
                            "ah,hwc,bw->abc", mats[0], base, mats[1])
                        canvases.append(jnp.pad(
                            xf, ((padh, net_h - padh - rh),
                                 (padw, net_w - padw - rw), (0, 0))))
                    image_phys = jnp.stack(canvases).astype(net.dtype)
                elif pack_u8:
                    # flat live-region buffer -> normalized padded canvases:
                    # u8/256 - 0.5 inside the region, 0 padding — identical
                    # to process_and_pad_image (rtpose.cpp:258-263) on the
                    # full canvas, at ~57% of the 3-scale upload bytes
                    canvases = []
                    for rh, rw, padh, padw, off in pack_regs:
                        seg = image_phys[off : off + rh * rw * 3]
                        xf = seg.astype(jnp.float32).reshape(rh, rw, 3) / 256.0 - 0.5
                        canvases.append(jnp.pad(
                            xf, ((padh, net_h - padh - rh),
                                 (padw, net_w - padw - rw), (0, 0))))
                    image_phys = jnp.stack(canvases).astype(net.dtype)
                elif input_u8:
                    # exact process_and_pad_image normalize: u8/256 - 0.5 in
                    # the image region, 0 in the padding (rtpose.cpp:258-263)
                    xf = image_phys.astype(jnp.float32) / 256.0 - 0.5
                    image_phys = (xf * jnp.asarray(mask)).astype(net.dtype)
                blobs = net._apply(params, {"image": image_phys}, jax.random.PRNGKey(0),
                                   None, False, impls=impls)
                low = blobs[lowres_blob]  # (S, h, w, C)
                parts_low = low[..., :num_parts]
                if use_pallas:
                    # fused Pallas tile kernel: upsample matmuls + peak
                    # stencil in VMEM (ops/nms_pallas.peak_mask_fused) — the
                    # (P, th, tw) f32 heat map is never materialized; its
                    # only consumer was this stencil (refinement and PAF
                    # scoring recompute from low-res).  Mask/keys/compaction
                    # semantics identical to the XLA chain below.
                    from ..ops.nms import block_keys, compact_keys, refine_from_low
                    from ..ops.nms_pallas import peak_mask_fused

                    pmask = peak_mask_fused(
                        parts_low, (th, tw), start_scale, scale_gap,
                        nms_threshold, interpret=pallas_interpret)
                    kbm = block_keys(pmask, th, tw)
                    ppos, pval, pcnt = compact_keys(
                        kbm.reshape(num_parts, -1), th * tw, max_peaks)
                    peaks = refine_from_low(
                        low[..., : num_parts + 1], ppos, pval, pcnt,
                        (th, tw), max_peaks, start_scale, scale_gap)
                else:
                    resized = imresize_average(parts_low, th, tw, start_scale, scale_gap)
                    heat = jnp.transpose(resized[0], (2, 0, 1))  # (P, th, tw)
                    # num_parts+1 channels: the extra (background) channel
                    # feeds the reference's past-the-channel refinement
                    # reads for peaks near the bottom edge (ops/nms.py)
                    peaks = refined_peaks_lowres(
                        low[..., : num_parts + 1], heat, nms_threshold,
                        max_peaks, start_scale, scale_gap)
                if eff_peaks < max_peaks:
                    # first-K truncation in raster order (reference peak
                    # indexing is ordinal, so this is exact for counts <= K).
                    # Slot 0 keeps the RAW count: consumers clamp to the row
                    # dimension, and the host uses it to DETECT overflow and
                    # refetch the frame uncapped (no silent truncation).
                    peaks = peaks[:, : eff_peaks + 1]
                pair_score, pair_count = C.score_pairs_lowres(
                    low, peaks, desc, (th, tw), start_scale, scale_gap, inter_threshold
                )
                # single byte-packed D2H buffer: f32 peaks | f16 scores | u8
                # counts — ~2.5x smaller than three f32 arrays, one fetch RTT
                packed = jnp.concatenate([
                    jax.lax.bitcast_convert_type(peaks.reshape(-1), jnp.uint8).reshape(-1),
                    jax.lax.bitcast_convert_type(
                        pair_score.astype(jnp.float16).reshape(-1), jnp.uint8
                    ).reshape(-1),
                    pair_count.astype(jnp.uint8).reshape(-1),
                ])
                return {"packed": packed}

            if is_default:
                self._packed = True
            if batch > 1:
                fn = jax.vmap(fn, in_axes=(None, 0, None, None))
        else:
            if batch > 1:
                raise ValueError("batch > 1 requires the optimized packed path")
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

            if is_default:
                self._packed = False

        if is_default:
            self._raw_fn = fn
        return jax.jit(fn)

    def unpack(self, packed: np.ndarray, eff: Optional[int] = None):
        """Split the single byte-packed D2H buffer into (peaks, score, count).

        ``eff``: the peak capacity the producing program was compiled with
        (defaults to the capped production program; the overflow refetch
        path passes max_peaks)."""
        P, M, L = self.num_parts, (eff or self.eff_peaks), self.descriptor.num_limbs
        n_peaks = P * (M + 1) * 3 * 4
        n_score = L * M * M * 2
        buf = packed.tobytes()
        peaks = np.frombuffer(buf, np.float32, P * (M + 1) * 3, 0).reshape(P, M + 1, 3)
        score = np.frombuffer(buf, np.float16, L * M * M, n_peaks).astype(np.float32).reshape(L, M, M)
        count = np.frombuffer(buf, np.uint8, L * M * M, n_peaks + n_score).astype(np.int32).reshape(L, M, M)
        return peaks, score, count

    def run_device(self, net_input: np.ndarray, nms_threshold=None, inter_threshold=None,
                   _compiled=None):
        """net_input: (S, 3, net_h, net_w) caffe layout -> device outputs."""
        p = self.params_connect
        nms_thr = jnp.float32(p.nms_threshold if nms_threshold is None else nms_threshold)
        inter_thr = jnp.float32(p.inter_threshold if inter_threshold is None else inter_threshold)
        if self.input_u8:
            # (S, H, W, 3) u8 canvases pass straight through
            x = jax.device_put(net_input)
        else:
            x = layout.to_physical(jnp.asarray(net_input)).astype(self.net.dtype)
        compiled = self._compiled if _compiled is None else _compiled
        return compiled(self.net.params, x, nms_thr, inter_thr)

    # ---------------------------------------------- pair_cap overflow path

    def _nocap_compiled(self):
        """Full-capacity single-frame program (pair_cap off).  Built lazily
        on the first overflow, or eagerly by the ``warm_overflow``
        background thread; the lock keeps concurrent fetcher threads from
        tracing it twice."""
        with self._nocap_lock:
            if self._compiled_nocap is None:
                self._compiled_nocap = self._build_compiled(
                    eff_peaks=self.max_peaks, batch=1)
            return self._compiled_nocap

    def overflowed(self, peaks: np.ndarray) -> bool:
        """True when a part produced more peaks than the pair_cap program
        transferred (slot 0 carries the RAW count; rows stop at eff_peaks).
        Such a frame must be refetched uncapped — a silent first-K
        truncation would diverge from the reference for >cap-people
        scenes."""
        return (self._packed and self.eff_peaks < self.max_peaks
                and float(np.max(peaks[:, 0, 0])) > self.eff_peaks)

    def refetch_full(self, net_input: np.ndarray, nms_threshold=None,
                     inter_threshold=None):
        """Overflow slow path: rerun ONE frame with the cap disabled and
        return (peaks, pair_score, pair_count) at full max_peaks.  Logged —
        capping must never be silent."""
        import sys

        self._overflow_refetches = getattr(self, "_overflow_refetches", 0) + 1
        print(
            f"caffe_rtpose_tpu: pair_cap={self.eff_peaks} overflow -> "
            f"refetching frame at max_peaks={self.max_peaks} "
            f"(#{self._overflow_refetches})",
            file=sys.stderr,
        )
        out = self.run_device(net_input, nms_threshold, inter_threshold,
                              _compiled=self._nocap_compiled())
        return self.unpack(np.asarray(jax.device_get(out["packed"])),
                           eff=self.max_peaks)

    # --------------------------------------------------------------- host

    def input_shape(self) -> Tuple[int, ...]:
        """Host-side transfer shape for ONE frame (no batch axis)."""
        if self.device_rescale:
            from .preprocess import scale_dims

            tw, th = scale_dims(self.net_w, self.net_h, self.start_scale)
            return (th * tw * 3,)
        if self.pack_u8:
            from .preprocess import packed_regions

            _, total = packed_regions(self.net_w, self.net_h, self.num_scales,
                                      self.start_scale, self.scale_gap)
            return (total,)
        if self.input_u8:
            return (self.num_scales, self.net_h, self.net_w, 3)
        return (self.num_scales, 3, self.net_h, self.net_w)

    @property
    def input_dtype(self):
        return np.uint8 if self.input_u8 else np.float32

    def make_input(self, display_bgr: np.ndarray) -> np.ndarray:
        """Display-res BGR frame -> this estimator's transfer format."""
        from .preprocess import (make_net_input, make_net_input_u8,
                                 make_net_input_u8_base,
                                 make_net_input_u8_packed)

        if self.device_rescale:
            return make_net_input_u8_base(display_bgr, self.net_w, self.net_h,
                                          self.start_scale)
        make = (make_net_input_u8_packed if self.pack_u8
                else make_net_input_u8 if self.input_u8 else make_net_input)
        return make(display_bgr, self.net_w, self.net_h, self.num_scales,
                    self.start_scale, self.scale_gap)

    def fetch(self, out) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Device outputs -> host (peaks, pair_score, pair_count)."""
        if self._packed:
            return self.unpack(np.asarray(jax.device_get(out["packed"])))
        return (
            np.asarray(jax.device_get(out["peaks"])),
            np.asarray(jax.device_get(out["pair_score"])),
            np.asarray(jax.device_get(out["pair_count"])),
        )

    def fetch_batch(self, out):
        """Batched device outputs -> list of (peaks, score, count), one per
        frame of the batch."""
        if not self._packed:
            raise ValueError("fetch_batch requires the packed path")
        rows = np.asarray(jax.device_get(out["packed"]))
        if rows.ndim == 1:
            rows = rows[None]
        return [self.unpack(r) for r in rows]

    def estimate_from_net_input(
        self,
        net_input: np.ndarray,
        scale_xy: Tuple[float, float] = (1.0, 1.0),
        nms_threshold=None,
        params_connect: Optional[ConnectParams] = None,
    ) -> PoseResult:
        pc = params_connect or self.params_connect
        if self.batch > 1:
            # batch-compiled program: pad the single frame to a full batch
            x = np.broadcast_to(np.asarray(net_input), (self.batch,) + np.asarray(net_input).shape)
            out = self.run_device(x, nms_threshold=nms_threshold, inter_threshold=pc.inter_threshold)
            peaks, pair_score, pair_count = self.fetch_batch(out)[0]
        else:
            out = self.run_device(net_input, nms_threshold=nms_threshold, inter_threshold=pc.inter_threshold)
            peaks, pair_score, pair_count = self.fetch(out)
        if self.overflowed(peaks):
            peaks, pair_score, pair_count = self.refetch_full(
                net_input, nms_threshold=nms_threshold,
                inter_threshold=pc.inter_threshold)
        res = C.assemble_fast(peaks, pair_score, pair_count, self.descriptor, pc, scale_xy)
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
            u8=("base" if self.device_rescale
                else "packed" if self.pack_u8 else self.input_u8),
        )
        dw = disp_w if disp_w is not None else pf.display.shape[1]
        dh = disp_h if disp_h is not None else pf.display.shape[0]
        scale_xy = (dw / float(self.net_w), dh / float(self.net_h))
        result = self.estimate_from_net_input(pf.net_input, scale_xy=scale_xy, **kw)
        return result, pf
