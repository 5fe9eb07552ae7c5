"""Limb assembly tests: the jax PAF scorer vs the loop oracle, and end-to-end
assembly on synthetic multi-person heatmaps with known ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from caffe_rtpose_tpu.pose import connect as C
from caffe_rtpose_tpu.pose.descriptor import COCO_18, MPI_15, ConnectParams


def synth_people(desc, people_xy, H=92, W=124, sigma=2.5, paf_width=2.0):
    """Build part heatmaps + PAFs for given per-person part coordinates.

    people_xy: list of {part_id: (x, y)} dicts.
    Returns heatmap stack shaped like resized_map channels (parts+bkg+pafs).
    """
    n_channels = max(max(desc.map_idx) + 1, desc.num_parts + 1)
    hm = np.zeros((n_channels, H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    for person in people_xy:
        for pid, (px, py) in person.items():
            hm[pid] = np.maximum(
                hm[pid], np.exp(-((xx - px) ** 2 + (yy - py) ** 2) / (2 * sigma ** 2))
            )
    # PAFs: unit vector along each limb within a corridor
    for k in range(desc.num_limbs):
        a, b = desc.limb(k)
        cx, cy = desc.paf_channels(k)
        for person in people_xy:
            if a not in person or b not in person:
                continue
            ax, ay = person[a]
            bx, by = person[b]
            dx, dy = bx - ax, by - ay
            norm = np.hypot(dx, dy)
            if norm < 1e-6:
                continue
            ux, uy = dx / norm, dy / norm
            # distance along and across the segment
            relx, rely = xx - ax, yy - ay
            along = relx * ux + rely * uy
            across = np.abs(relx * -uy + rely * ux)
            corridor = (along >= -1) & (along <= norm + 1) & (across <= paf_width)
            hm[cx] = np.where(corridor, ux, hm[cx])
            hm[cy] = np.where(corridor, uy, hm[cy])
    return hm


def peaks_from_truth(desc, people_xy, max_peaks=16):
    """Exact peak table from ground-truth coordinates (score 1.0)."""
    P = desc.num_parts
    peaks = np.zeros((P, max_peaks + 1, 3), np.float32)
    for person in people_xy:
        for pid, (px, py) in person.items():
            n = int(peaks[pid, 0, 0])
            if n < max_peaks:
                peaks[pid, n + 1] = (px, py, 1.0)
                peaks[pid, 0, 0] = n + 1
    return peaks


TWO_PEOPLE = [
    {0: (30, 14), 1: (30, 26), 2: (22, 26), 3: (20, 40), 4: (18, 54),
     5: (38, 26), 6: (40, 40), 7: (42, 54), 8: (25, 52), 9: (25, 66),
     10: (25, 80), 11: (35, 52), 12: (35, 66), 13: (35, 80),
     14: (27, 11), 15: (33, 11), 16: (24, 12), 17: (36, 12)},
    {0: (85, 16), 1: (85, 28), 2: (77, 28), 3: (75, 42), 4: (73, 56),
     5: (93, 28), 6: (95, 42), 7: (97, 56), 8: (80, 54), 9: (80, 68),
     10: (80, 82), 11: (90, 54), 12: (90, 68), 13: (90, 82),
     14: (82, 13), 15: (88, 13), 16: (79, 14), 17: (91, 14)},
]


def test_score_pairs_jax_matches_oracle():
    desc = COCO_18
    hm = synth_people(desc, TWO_PEOPLE)
    peaks = peaks_from_truth(desc, TWO_PEOPLE)
    thr = desc.defaults.inter_threshold
    s_np, c_np = C.score_pairs_np(hm, peaks, desc, thr)
    s_j, c_j = C.score_pairs(jnp.asarray(hm), jnp.asarray(peaks), desc, jnp.float32(thr))
    # oracle only fills rows/cols up to the real peak counts; compare there
    for k in range(desc.num_limbs):
        a, b = desc.limb(k)
        na, nb = int(peaks[a, 0, 0]), int(peaks[b, 0, 0])
        np.testing.assert_allclose(
            np.asarray(s_j)[k, :na, :nb], s_np[k, :na, :nb], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(c_j)[k, :na, :nb], c_np[k, :na, :nb])


def test_assemble_two_people():
    desc = COCO_18
    hm = synth_people(desc, TWO_PEOPLE)
    peaks = peaks_from_truth(desc, TWO_PEOPLE)
    res = C.connect_limbs(hm, peaks, desc)
    assert res.num_people == 2
    # every person has all 18 parts near ground truth
    got = sorted(res.joints.tolist(), key=lambda p: p[0][0])
    want = sorted(TWO_PEOPLE, key=lambda d: d[0][0])
    for joints, truth in zip(got, want):
        for pid, (px, py) in truth.items():
            assert abs(joints[pid][0] - px) <= 1.0
            assert abs(joints[pid][1] - py) <= 1.0
            assert joints[pid][2] > 0.5


def test_assemble_scale_xy():
    desc = COCO_18
    hm = synth_people(desc, TWO_PEOPLE)
    peaks = peaks_from_truth(desc, TWO_PEOPLE)
    res1 = C.connect_limbs(hm, peaks, desc)
    res2 = C.connect_limbs(hm, peaks, desc, scale_xy=(2.0, 3.0))
    live = res1.joints[:, :, 2] > 0
    np.testing.assert_allclose(res2.joints[:, :, 0][live], 2.0 * res1.joints[:, :, 0][live])
    np.testing.assert_allclose(res2.joints[:, :, 1][live], 3.0 * res1.joints[:, :, 1][live])


def test_min_subset_filters():
    desc = COCO_18
    # one lonely nose peak -> single-part subsets fail min_subset_cnt=3
    peaks = np.zeros((18, 17, 3), np.float32)
    peaks[0, 0, 0] = 1
    peaks[0, 1] = (10, 10, 0.9)
    hm = np.zeros((57, 46, 62), np.float32)
    res = C.connect_limbs(hm, peaks, desc)
    assert res.num_people == 0


def test_mpi_descriptor_tables():
    assert MPI_15.num_parts == 15
    assert MPI_15.num_limbs == 14
    assert COCO_18.num_parts == 18
    assert COCO_18.num_limbs == 19
    # PAF channel indices must lie beyond the part+bkg channels
    assert min(COCO_18.map_idx) == 19
    assert max(COCO_18.map_idx) == 56
    assert min(MPI_15.map_idx) == 16
    assert max(MPI_15.map_idx) == 43


class TestDistanceThresholdPeaks:
    """distanceThresholdPeaks parity (rtpose.cpp:753-806, dead code there)."""

    def test_dedup_and_swap(self):
        import numpy as np

        from caffe_rtpose_tpu.pose.connect import distance_threshold_peaks

        peaks = np.zeros((1, 6, 3), np.float32)
        peaks[0, 0, 0] = 4
        peaks[0, 1] = (10, 10, 0.5)
        peaks[0, 2] = (12, 11, 0.9)   # within 6px of #1, better -> swaps in
        peaks[0, 3] = (100, 100, 0.3)
        peaks[0, 4] = (103, 100, 0.1)  # within 6px of #3, worse -> dropped
        out = distance_threshold_peaks(peaks)
        assert int(out[0, 0, 0]) == 2
        np.testing.assert_allclose(out[0, 1], (12, 11, 0.9))
        np.testing.assert_allclose(out[0, 2], (100, 100, 0.3))

    def test_far_peaks_kept(self):
        import numpy as np

        from caffe_rtpose_tpu.pose.connect import distance_threshold_peaks

        peaks = np.zeros((2, 4, 3), np.float32)
        peaks[0, 0, 0] = 3
        peaks[0, 1] = (0, 0, 0.1)
        peaks[0, 2] = (50, 50, 0.2)
        peaks[0, 3] = (100, 0, 0.3)
        out = distance_threshold_peaks(peaks)
        assert int(out[0, 0, 0]) == 3
        assert int(out[1, 0, 0]) == 0
