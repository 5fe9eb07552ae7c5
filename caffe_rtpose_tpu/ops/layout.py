"""Layout conventions.

Caffe blobs are logically NCHW; on TPU we keep 4-D activations physically
NHWC (lane dimension = channels) so convolutions tile onto the MXU without
relayout.  The graph runtime tracks the *caffe* (logical) shape of every blob
and maps channel-axis semantics (concat axis=1 etc.) onto the physical array.

Non-4D blobs are stored in their caffe shape unchanged.
"""

from __future__ import annotations

from typing import Sequence, Tuple

# permutation caffe->physical for 4-D: (N, C, H, W) -> (N, H, W, C)
TO_PHYSICAL_4D = (0, 2, 3, 1)
# permutation physical->caffe for 4-D: (N, H, W, C) -> (N, C, H, W)
TO_CAFFE_4D = (0, 3, 1, 2)

# caffe axis index -> physical axis index for 4-D arrays
_AXIS_C2P_4D = {0: 0, 1: 3, 2: 1, 3: 2}
_AXIS_P2C_4D = {0: 0, 3: 1, 1: 2, 2: 3}


def caffe_axis_to_physical(ndim: int, axis: int) -> int:
    """Map a caffe axis (possibly negative) to the physical array axis."""
    if axis < 0:
        axis += ndim
    if not 0 <= axis < ndim:
        raise ValueError(f"axis {axis} out of range for ndim {ndim}")
    if ndim == 4:
        return _AXIS_C2P_4D[axis]
    return axis


def caffe_shape_of(physical_shape: Sequence[int], ndim_caffe: int) -> Tuple[int, ...]:
    s = tuple(physical_shape)
    if ndim_caffe == 4 and len(s) == 4:
        return (s[0], s[3], s[1], s[2])
    return s


def physical_shape_of(caffe_shape: Sequence[int]) -> Tuple[int, ...]:
    s = tuple(caffe_shape)
    if len(s) == 4:
        return (s[0], s[2], s[3], s[1])
    return s


def to_physical(arr):
    """Caffe-layout ndarray -> physical layout (transpose 4-D only)."""
    if arr.ndim == 4:
        return arr.transpose(TO_PHYSICAL_4D)
    return arr


def to_caffe(arr):
    if arr.ndim == 4:
        return arr.transpose(TO_CAFFE_4D)
    return arr
