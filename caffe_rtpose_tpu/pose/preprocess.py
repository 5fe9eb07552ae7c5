"""Frame preprocessing: aspect-preserving display warp + per-scale resize,
center-pad and normalize — byte-for-byte the reference producer semantics
(process_and_pad_image rtpose.cpp:239-269; scale loop rtpose.cpp:508-518;
display warp rtpose.cpp:325-338/475-487).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in the target image
    cv2 = None


def display_scale(ori_w: int, ori_h: int, disp_w: int, disp_h: int) -> float:
    """Aspect-preserving scale into the display canvas (rtpose.cpp:325-330)."""
    if ori_w / float(ori_h) > disp_w / float(disp_h):
        return disp_w / float(ori_w)
    return disp_h / float(ori_h)


def _native_warp():
    """ctypes handle to native/cvwarp.cpp (the reference warpAffine built
    against the SYSTEM OpenCV), or None.  Opt-in via CRT_NATIVE_WARP=1:
    bicubic warp pixels are OpenCV-version-dependent, so byte parity with
    an rtpose.bin linked against the distro OpenCV needs this path; the
    default python-cv2 path differs only by that library version drift."""
    import os

    if os.environ.get("CRT_NATIVE_WARP") != "1":
        return None
    import ctypes

    from .. import native

    lib = native.load_lib(
        "cvwarp",
        extra_flags=("-I/usr/include/opencv4", "-lopencv_core",
                     "-lopencv_imgproc"),
    )
    if lib is not None and not getattr(lib, "_crt_warp_ready", False):
        lib.crt_warp_display.restype = ctypes.c_int
        lib.crt_warp_display.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ]
        lib._crt_warp_ready = True
    return lib


def warp_to_display(img_bgr: np.ndarray, disp_w: int, disp_h: int) -> Tuple[np.ndarray, float]:
    """Scale about the origin into a (disp_h, disp_w) canvas, black-padded
    bottom/right (cv2.warpAffine with a diagonal matrix, CV_INTER_CUBIC)."""
    if cv2 is None:
        raise RuntimeError("OpenCV unavailable")
    scale = display_scale(img_bgr.shape[1], img_bgr.shape[0], disp_w, disp_h)
    if scale == 1.0 and img_bgr.shape[:2] == (disp_h, disp_w):
        # identity warp: bicubic at exact integer sample points copies the
        # pixel (Catmull-Rom weights collapse to (0,1,0,0)), so skipping the
        # warpAffine is byte-identical — and it is ~22 ms/frame of single
        # -core host time at 720p, the realtime producer's biggest cost
        return img_bgr, scale
    lib = _native_warp()
    if lib is not None:
        import ctypes

        src = np.ascontiguousarray(img_bgr, np.uint8)
        dst = np.empty((disp_h, disp_w, 3), np.uint8)
        rc = lib.crt_warp_display(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            src.shape[0], src.shape[1], float(scale),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            disp_h, disp_w,
        )
        if rc == 0:
            return dst, scale
    M = np.array([[scale, 0, 0], [0, scale, 0]], np.float64)
    warped = cv2.warpAffine(
        img_bgr, M, (disp_w, disp_h), flags=cv2.INTER_CUBIC,
        borderMode=cv2.BORDER_CONSTANT, borderValue=(0, 0, 0),
    )
    return warped, scale


def pad_and_normalize(img_bgr: np.ndarray, tw: int, th: int, normalize: bool) -> np.ndarray:
    """process_and_pad_image: center-place into (th, tw), x/256 - 0.5, CHW."""
    oh, ow = img_bgr.shape[:2]
    padw = (tw - ow) // 2
    padh = (th - oh) // 2
    if padw < 0 or padh < 0:
        raise ValueError("Image too big for target size.")
    out = np.zeros((3, th, tw), np.float32)
    img = img_bgr.astype(np.float32)
    if normalize:
        img = img / 256.0 - 0.5
    out[:, padh : padh + oh, padw : padw + ow] = img.transpose(2, 0, 1)
    return out


def scale_dims(net_w: int, net_h: int, scale: float) -> Tuple[int, int]:
    """Per-scale target dims: 16 * ceil(net_dim * scale / 16) (rtpose.cpp:509-511)."""
    tw = 16 * int(math.ceil(net_w * scale / 16))
    th = 16 * int(math.ceil(net_h * scale / 16))
    if tw > net_w or th > net_h:
        raise ValueError("scale produces dims above net resolution")
    return tw, th


def make_net_input(
    img_bgr: np.ndarray,
    net_w: int,
    net_h: int,
    num_scales: int = 1,
    start_scale: float = 1.0,
    scale_gap: float = 0.3,
) -> np.ndarray:
    """Display-res frame -> (num_scales, 3, net_h, net_w) float32 net input
    (CV_INTER_AREA per-scale resize + center pad + /256-0.5)."""
    if cv2 is None:
        raise RuntimeError("OpenCV unavailable")
    out = np.zeros((num_scales, 3, net_h, net_w), np.float32)
    for i in range(num_scales):
        scale = start_scale - i * scale_gap
        tw, th = scale_dims(net_w, net_h, scale)
        resized = cv2.resize(img_bgr, (tw, th), interpolation=cv2.INTER_AREA)
        out[i] = pad_and_normalize(resized, net_w, net_h, normalize=True)
    return out


def region_boxes(net_w: int, net_h: int, num_scales: int, start_scale: float, scale_gap: float):
    """Static per-scale image regions inside the padded canvas:
    (y0, y1, x0, x1) per scale."""
    boxes = []
    for i in range(num_scales):
        tw, th = scale_dims(net_w, net_h, start_scale - i * scale_gap)
        padw = (net_w - tw) // 2
        padh = (net_h - th) // 2
        boxes.append((padh, padh + th, padw, padw + tw))
    return boxes


def make_net_input_u8(
    img_bgr: np.ndarray,
    net_w: int,
    net_h: int,
    num_scales: int = 1,
    start_scale: float = 1.0,
    scale_gap: float = 0.3,
) -> np.ndarray:
    """u8 transfer format: (S, net_h, net_w, 3) padded canvases, NHWC.

    4x smaller host->device payload than the f32 canvas; the device applies
    x/256 - 0.5 inside the image region and zero outside (exact in f32, so
    bit-identical to process_and_pad_image + normalize).
    """
    if cv2 is None:
        raise RuntimeError("OpenCV unavailable")
    out = np.zeros((num_scales, net_h, net_w, 3), np.uint8)
    for i, (y0, y1, x0, x1) in enumerate(
        region_boxes(net_w, net_h, num_scales, start_scale, scale_gap)
    ):
        resized = cv2.resize(img_bgr, (x1 - x0, y1 - y0), interpolation=cv2.INTER_AREA)
        out[i, y0:y1, x0:x1] = resized
    return out


def packed_regions(net_w: int, net_h: int, num_scales: int,
                   start_scale: float, scale_gap: float):
    """Layout of the scale-sublinear u8 transfer buffer: per scale
    (th, tw, padh, padw, byte_offset), plus the total byte count.

    Scale n's live region is only (tw_n, th_n) inside the padded canvas
    (padw = (net_w - tw)//2, imresize_layer.cu:110-140 pad math); shipping
    the padding bytes over the host->device link is pure waste, so the
    packed format concatenates just the live regions."""
    regs = []
    off = 0
    for i in range(num_scales):
        tw, th = scale_dims(net_w, net_h, start_scale - i * scale_gap)
        regs.append((th, tw, (net_h - th) // 2, (net_w - tw) // 2, off))
        off += th * tw * 3
    return regs, off


def make_net_input_u8_packed(
    img_bgr: np.ndarray,
    net_w: int,
    net_h: int,
    num_scales: int = 1,
    start_scale: float = 1.0,
    scale_gap: float = 0.3,
) -> np.ndarray:
    """Scale-sublinear u8 transfer format: one flat (total_bytes,) buffer of
    concatenated per-scale live regions (no padding bytes).  The device
    program normalizes and zero-pads each region back into its
    (net_h, net_w) canvas — bit-identical to make_net_input_u8 + the
    on-device mask normalize, at ~57% of the upload bytes for the
    reference 3-scale config."""
    if cv2 is None:
        raise RuntimeError("OpenCV unavailable")
    regs, total = packed_regions(net_w, net_h, num_scales, start_scale, scale_gap)
    out = np.empty(total, np.uint8)
    for th, tw, _, _, off in regs:
        resized = cv2.resize(img_bgr, (tw, th), interpolation=cv2.INTER_AREA)
        out[off : off + th * tw * 3] = resized.reshape(-1)
    return out


def area_axis_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) INTER_AREA weights for one axis (box-overlap / "pixel
    area relation", the cv2 float path for arbitrary downscale ratios).
    Row i averages src interval [i*src/dst, (i+1)*src/dst); rows sum to 1,
    so the matrix commutes with the affine u8 -> x/256-0.5 normalize."""
    if dst > src:
        raise ValueError("area_axis_matrix is for downscale only")
    r = src / float(dst)
    m = np.zeros((dst, src), np.float32)
    for i in range(dst):
        lo, hi = i * r, (i + 1) * r
        j0, j1 = int(math.floor(lo)), int(math.ceil(hi))
        for j in range(j0, min(j1, src)):
            m[i, j] = (min(j + 1, hi) - max(j, lo)) / r
    return m


def make_net_input_u8_base(
    img_bgr: np.ndarray,
    net_w: int,
    net_h: int,
    start_scale: float = 1.0,
) -> np.ndarray:
    """Device-rescale transfer format: ONE flat u8 buffer of the LARGEST
    scale's live region; the device derives every smaller scale from it
    with INTER_AREA matmuls (area_axis_matrix) and zero-pads the canvases.

    Documented divergence vs the reference (opt-in, --device_rescale):
    the reference resizes the display frame independently per scale
    (rtpose.cpp:508-518); deriving scale n from the scale-0 canvas is a
    resize-of-a-resize, so pixels differ at the level of interpolation
    rounding (~1-2 u8 levels), in exchange for a multi-scale upload that
    costs the same bytes as single-scale."""
    if cv2 is None:
        raise RuntimeError("OpenCV unavailable")
    tw, th = scale_dims(net_w, net_h, start_scale)
    resized = cv2.resize(img_bgr, (tw, th), interpolation=cv2.INTER_AREA)
    return np.ascontiguousarray(resized.reshape(-1))


@dataclass
class PreprocessedFrame:
    net_input: np.ndarray  # (S, 3, net_h, net_w)
    display: Optional[np.ndarray]  # (disp_h, disp_w, 3) u8 warped frame
    scale: float  # display scale vs original (for JSON 1/scale rescale)
    ori_width: int
    ori_height: int


def preprocess_frame(
    img_bgr: np.ndarray,
    net_w: int,
    net_h: int,
    disp_w: Optional[int] = None,
    disp_h: Optional[int] = None,
    num_scales: int = 1,
    start_scale: float = 1.0,
    scale_gap: float = 0.3,
    u8: bool = False,
) -> PreprocessedFrame:
    """Full producer-side transform for one frame (getFrameFromDir path).
    ``u8=True`` emits the raw (S, H, W, 3) u8 canvases for estimators built
    with ``input_u8`` (normalization runs on device); ``u8="packed"`` emits
    the flat live-region buffer (make_net_input_u8_packed)."""
    ori_h, ori_w = img_bgr.shape[:2]
    if disp_w is None or disp_h is None:
        disp_w, disp_h = ori_w, ori_h
        display = img_bgr
        scale = 1.0
    else:
        display, scale = warp_to_display(img_bgr, disp_w, disp_h)
    if u8 == "base":
        net_input = make_net_input_u8_base(display, net_w, net_h, start_scale)
    else:
        make = (make_net_input_u8_packed if u8 == "packed"
                else make_net_input_u8 if u8 else make_net_input)
        net_input = make(display, net_w, net_h, num_scales, start_scale, scale_gap)
    return PreprocessedFrame(
        net_input=net_input, display=display, scale=scale, ori_width=ori_w, ori_height=ori_h
    )
