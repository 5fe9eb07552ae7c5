"""The optimized estimator pipeline (part-only upsample + low-res matmul PAF
sampling) must agree with the generic graph path (full ImResize -> Nms ->
full-res sampling)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from caffe_rtpose_tpu.ops.imresize import imresize_average
from caffe_rtpose_tpu.pose import connect as C
from caffe_rtpose_tpu.pose.descriptor import COCO_18
from caffe_rtpose_tpu.pose.estimator import PoseEstimator

REF_COCO = "/root/reference/model/coco/pose_deploy_linevec.prototxt"


@pytest.mark.parametrize("scales,start,gap", [(1, 1.0, 0.3), (2, 1.0, 0.3)])
def test_score_pairs_lowres_matches_fullres(scales, start, gap):
    rs = np.random.RandomState(0)
    h, w, f = 12, 16, 8
    th, tw = h * f, w * f
    low = rs.rand(scales, h, w, 57).astype(np.float32) * 2 - 1
    # full-res reference: upsample all channels then sample with gathers
    full = imresize_average(jnp.asarray(low), th, tw, start, gap)  # (1, th, tw, 57)
    hm_chw = jnp.transpose(full[0], (2, 0, 1))
    peaks = np.zeros((18, 17, 3), np.float32)
    for p in range(18):
        n = rs.randint(1, 6)
        peaks[p, 0, 0] = n
        for i in range(1, n + 1):
            peaks[p, i] = (rs.uniform(0, tw - 1), rs.uniform(0, th - 1), rs.rand())
    thr = 0.05
    s_full, c_full = C.score_pairs(hm_chw, jnp.asarray(peaks), COCO_18, jnp.float32(thr))
    s_low, c_low = C.score_pairs_lowres(
        jnp.asarray(low), jnp.asarray(peaks), COCO_18, (th, tw), start, gap, jnp.float32(thr)
    )
    np.testing.assert_allclose(np.asarray(s_low), np.asarray(s_full), rtol=2e-4, atol=2e-4)
    # counts may differ only where a dot sits exactly at the threshold; with
    # random data that has measure zero
    np.testing.assert_array_equal(np.asarray(c_low), np.asarray(c_full))


@pytest.mark.skipif(not os.path.exists(REF_COCO), reason="reference not mounted")
def test_optimized_estimator_matches_generic():
    est_opt = PoseEstimator(REF_COCO, net_resolution=(128, 80), seed=7, keep_heatmap=False)
    est_gen = PoseEstimator(REF_COCO, net_resolution=(128, 80), seed=7, keep_heatmap=True)
    assert est_opt._packed and not est_gen._packed
    rs = np.random.RandomState(1)
    x = rs.rand(1, 3, 80, 128).astype(np.float32) - 0.5
    # low thresholds so random-weight maps yield peaks
    o1 = est_opt.run_device(x, nms_threshold=-1.0, inter_threshold=-10.0)
    o2 = est_gen.run_device(x, nms_threshold=-1.0, inter_threshold=-10.0)
    p1, s1, c1 = est_opt.fetch(o1)
    p2, s2, c2 = est_gen.fetch(o2)
    np.testing.assert_allclose(p1, p2, rtol=1e-3, atol=1e-3)
    assert p1[:, 0, 0].sum() > 0
    for k in range(19):
        a, b = COCO_18.limb(k)
        na, nb = int(p2[a, 0, 0]), int(p2[b, 0, 0])
        np.testing.assert_allclose(s1[k, :na, :nb], s2[k, :na, :nb], rtol=5e-3, atol=5e-3)
        np.testing.assert_array_equal(c1[k, :na, :nb], c2[k, :na, :nb])


@pytest.mark.skipif(not os.path.exists(REF_COCO), reason="reference not mounted")
def test_pair_cap_and_batch_match_uncapped():
    """pair_cap truncation is exact when counts <= cap, and the batched
    program returns per-frame results identical to one-at-a-time."""
    est_full = PoseEstimator(REF_COCO, net_resolution=(128, 80), seed=7,
                             input_u8=True)
    est_fast = PoseEstimator(REF_COCO, net_resolution=(128, 80), seed=7,
                             input_u8=True, pair_cap=32, batch=2)
    rs = np.random.RandomState(2)
    f1 = (rs.rand(1, 80, 128, 3) * 255).astype(np.uint8)
    f2 = (rs.rand(1, 80, 128, 3) * 255).astype(np.uint8)

    res_full = [est_full.fetch(est_full.run_device(f)) for f in (f1, f2)]
    pair = est_fast.fetch_batch(
        est_fast.run_device(np.stack([f1, f2]))
    )
    for (pf, sf, cf), (pc, sc, cc) in zip(res_full, pair):
        counts = pf[:, 0, 0].astype(int)
        assert counts.max() <= 32, "test assumption: few peaks"
        np.testing.assert_allclose(pc[:, 1:], pf[:, 1:33], rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(pc[:, 0, 0], pf[:, 0, 0])
        np.testing.assert_allclose(sc, sf[:, :32, :32], rtol=2e-2, atol=2e-2)
        np.testing.assert_array_equal(cc, cf[:, :32, :32])


def test_pallas_upsample_peaks_matches_xla_chain():
    """ops/nms_pallas.upsample_peak_keys (interpret mode on CPU) must
    bit-match imresize_average + find_peaks_mask key construction."""
    from caffe_rtpose_tpu.ops.nms import nms_peaks, peaks_from_keys
    from caffe_rtpose_tpu.ops.nms_pallas import upsample_peak_keys

    rs = np.random.RandomState(3)
    for scales, start, gap in [(1, 1.0, 0.3), (3, 0.9, 0.1)]:
        low = jnp.asarray(rs.rand(scales, 12, 16, 7).astype(np.float32) * 2 - 1)
        th_, tw_ = 96, 128
        thr = jnp.float32(0.2)
        ref_full = imresize_average(low, th_, tw_, start, gap)
        ref_heat = jnp.transpose(ref_full[0], (2, 0, 1))
        ref = np.asarray(nms_peaks(ref_heat, thr, 10))
        heat, kb = upsample_peak_keys(low, (th_, tw_), start, gap, thr,
                                      interpret=True)
        got = np.asarray(peaks_from_keys(heat, kb, 10))
        np.testing.assert_allclose(np.asarray(heat), np.asarray(ref_heat),
                                   atol=1e-5)
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pallas_peak_mask_matches_xla_chain():
    """ops/nms_pallas.peak_mask_fused (the production default on TPU) must
    bit-match find_peaks_mask(imresize_average(...)) and, composed with
    block_keys/compact_keys/refine_from_low, reproduce refined_peaks_lowres
    exactly (the estimator's two branches)."""
    from caffe_rtpose_tpu.ops.nms import (
        block_keys, compact_keys, find_peaks_mask, refine_from_low,
        refined_peaks_lowres)
    from caffe_rtpose_tpu.ops.nms_pallas import peak_mask_fused

    rs = np.random.RandomState(5)
    for scales, start, gap in [(1, 1.0, 0.3), (3, 0.9, 0.1)]:
        p = 6
        low = jnp.asarray(rs.rand(scales, 12, 16, p + 1).astype(np.float32) * 2 - 1)
        th_, tw_ = 96, 128
        thr = jnp.float32(0.2)
        heat = jnp.transpose(
            imresize_average(low[..., :p], th_, tw_, start, gap)[0], (2, 0, 1))
        ref_mask = np.asarray(find_peaks_mask(heat, thr))
        got_mask = np.asarray(peak_mask_fused(low[..., :p], (th_, tw_),
                                              start, gap, thr, interpret=True))
        np.testing.assert_array_equal(got_mask, ref_mask)

        ref_peaks = np.asarray(refined_peaks_lowres(low, heat, thr, 10, start, gap))
        kb = block_keys(jnp.asarray(got_mask), th_, tw_)
        pos, val, cnt = compact_keys(kb.reshape(p, -1), th_ * tw_, 10)
        got_peaks = np.asarray(refine_from_low(
            low, pos, val, cnt, (th_, tw_), 10, start, gap))
        np.testing.assert_array_equal(got_peaks, ref_peaks)


def test_compact_keys_property_random_dense():
    """Two-level block-ranked compaction == numpy raster scan on random
    masks dense enough to cross many 512-slot blocks and overflow
    max_peaks (the in-block search and the rank>count clamp paths)."""
    from caffe_rtpose_tpu.ops.nms import block_keys, compact_keys

    rs = np.random.RandomState(7)
    h, w = 46, 82
    for density, topk in ((0.002, 8), (0.05, 16), (0.4, 32), (0.9, 64)):
        # random boolean masks thinned so no two peaks are 8-adjacent
        # (block_keys' pair-collapse precondition, guaranteed for strict
        # maxima): keep a set pixel only if no earlier raster neighbor kept
        raw = rs.rand(3, h, w) < density
        raw[:, 0, :] = raw[:, -1, :] = False
        raw[:, :, 0] = raw[:, :, -1] = False
        mask = np.zeros_like(raw)
        for c in range(3):
            for y in range(1, h - 1):
                for x in range(1, w - 1):
                    if raw[c, y, x] and not (
                        mask[c, y - 1, x - 1 : x + 2].any()
                        or mask[c, y, x - 1]
                    ):
                        mask[c, y, x] = True
        kb = block_keys(jnp.asarray(mask), h, w)
        pos, valid, counts = compact_keys(kb, h * w, topk)
        pos, valid, counts = map(np.asarray, (pos, valid, counts))
        for c in range(3):
            ref = np.flatnonzero(mask[c].reshape(-1))
            assert counts[c] == len(ref)
            k = min(topk, len(ref))
            np.testing.assert_array_equal(pos[c, :k], ref[:k])
            assert valid[c, :k].all() and not valid[c, k:].any()


def test_compact_keys_full_res_many_blocks():
    """Full 368x656 map (236 ranking blocks): raster order and counts hold
    when peaks span many blocks and some blocks are empty."""
    from caffe_rtpose_tpu.ops.nms import block_keys, compact_keys

    rs = np.random.RandomState(11)
    h, w = 368, 656
    mask = np.zeros((1, h, w), bool)
    kept = []
    for pos in np.sort(rs.choice(h * w, 3000, replace=False)):
        y, x = divmod(int(pos), w)
        if 1 <= y < h - 1 and 1 <= x < w - 1 and all(
            abs(y - ky) > 1 or abs(x - kx) > 1 for ky, kx in kept[-80:]
        ):
            mask[0, y, x] = True
            kept.append((y, x))
    kb = block_keys(jnp.asarray(mask), h, w)
    pos, valid, counts = compact_keys(kb, h * w, 64)
    ref = np.flatnonzero(mask[0].reshape(-1))
    assert int(counts[0]) == len(ref)
    np.testing.assert_array_equal(np.asarray(pos)[0], ref[:64])
    assert np.asarray(valid)[0].all()
