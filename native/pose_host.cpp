// Native host-side runtime for caffe_rtpose_tpu.
//
// Implements the sequential greedy PAF limb assembly (the per-frame host hot
// loop; behavioral spec: connectLimbs/connectLimbsCOCO, reference
// examples/rtpose/rtpose.cpp:549-751,808-1076) over the score/count tensors
// produced by the TPU device program.  Exposed via a plain C ABI for ctypes.
//
// Inputs:
//   peaks      float[num_parts][max_peaks+1][3]   (x, y, score; slot 0 = count)
//   pair_score float[num_limbs][max_peaks][max_peaks]  summed qualified dots
//   pair_count int32[num_limbs][max_peaks][max_peaks]
//   limb_seq   int32[2*num_limbs]   part-id pairs
// Output:
//   joints_out float[max_people][num_parts][3], returns people count.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Candidate {
  int i;
  int j;
  double score;
};

}  // namespace

extern "C" {

int crt_assemble(
    const float* peaks, int num_parts, int max_peaks,
    const float* pair_score, const int32_t* pair_count,
    const int32_t* limb_seq, int num_limbs,
    int min_subset_cnt, float min_subset_score,
    int inter_min_above_threshold,
    int dedup_single_endpoint,
    float scale_x, float scale_y,
    float* joints_out, int max_people) {
  const int peaks_offset = 3 * (max_peaks + 1);
  const int SUBSET_CNT = num_parts + 2;
  const int SUBSET_SCORE = num_parts + 1;
  const int SUBSET_SIZE = num_parts + 3;

  std::vector<std::vector<double>> subsets;
  subsets.reserve(64);

  for (int k = 0; k < num_limbs; ++k) {
    const int part_a = limb_seq[2 * k];
    const int part_b = limb_seq[2 * k + 1];
    const float* cand_a = peaks + part_a * peaks_offset;
    const float* cand_b = peaks + part_b * peaks_offset;
    int nA = static_cast<int>(cand_a[0]);
    int nB = static_cast<int>(cand_b[0]);
    nA = std::min(nA, max_peaks);
    nB = std::min(nB, max_peaks);

    if (nA == 0 && nB == 0) continue;
    if (nA == 0) {
      for (int i = 1; i <= nB; ++i) {
        const double off = part_b * peaks_offset + i * 3 + 2;
        if (dedup_single_endpoint) {
          bool found = false;
          for (const auto& s : subsets)
            if (s[part_b] == off) { found = true; break; }
          if (found) continue;
        }
        std::vector<double> row(SUBSET_SIZE, 0.0);
        row[part_b] = off;
        row[SUBSET_CNT] = 1;
        row[SUBSET_SCORE] = cand_b[i * 3 + 2];
        subsets.push_back(std::move(row));
      }
      continue;
    }
    if (nB == 0) {
      for (int i = 1; i <= nA; ++i) {
        const double off = part_a * peaks_offset + i * 3 + 2;
        if (dedup_single_endpoint) {
          bool found = false;
          for (const auto& s : subsets)
            if (s[part_a] == off) { found = true; break; }
          if (found) continue;
        }
        std::vector<double> row(SUBSET_SIZE, 0.0);
        row[part_a] = off;
        row[SUBSET_CNT] = 1;
        row[SUBSET_SCORE] = cand_a[i * 3 + 2];
        subsets.push_back(std::move(row));
      }
      continue;
    }

    // candidate pairs above the count threshold
    std::vector<Candidate> temp;
    temp.reserve(nA * nB);
    const float* sc = pair_score + (size_t)k * max_peaks * max_peaks;
    const int32_t* ct = pair_count + (size_t)k * max_peaks * max_peaks;
    for (int i = 1; i <= nA; ++i) {
      for (int j = 1; j <= nB; ++j) {
        const int cnt = ct[(i - 1) * max_peaks + (j - 1)];
        if (cnt > inter_min_above_threshold) {
          temp.push_back({i, j, (double)sc[(i - 1) * max_peaks + (j - 1)] / cnt});
        }
      }
    }
    // stable sort by descending connection score (fixes the reference's
    // unspecified equal-key order, rtpose.cpp ColumnCompare)
    std::stable_sort(temp.begin(), temp.end(),
                     [](const Candidate& a, const Candidate& b) { return a.score > b.score; });

    struct Conn { double idx_a, idx_b, score; };
    std::vector<Conn> connection_k;
    std::vector<char> occur_a(nA, 0), occur_b(nB, 0);
    const int num = std::min(nA, nB);
    for (const auto& c : temp) {
      if ((int)connection_k.size() == num) break;
      if (!occur_a[c.i - 1] && !occur_b[c.j - 1]) {
        connection_k.push_back({(double)(part_a * peaks_offset + c.i * 3 + 2),
                                (double)(part_b * peaks_offset + c.j * 3 + 2),
                                c.score});
        occur_a[c.i - 1] = 1;
        occur_b[c.j - 1] = 1;
      }
    }

    if (k == 0) {
      for (const auto& c : connection_k) {
        std::vector<double> row(SUBSET_SIZE, 0.0);
        row[limb_seq[0]] = c.idx_a;
        row[limb_seq[1]] = c.idx_b;
        row[SUBSET_CNT] = 2;
        row[SUBSET_SCORE] = peaks[(int)c.idx_a] + peaks[(int)c.idx_b] + c.score;
        subsets.push_back(std::move(row));
      }
    } else {
      if (connection_k.empty()) continue;
      for (const auto& c : connection_k) {
        int found = 0;
        for (auto& s : subsets) {
          if (s[part_a] == c.idx_a) {
            s[part_b] = c.idx_b;
            ++found;
            s[SUBSET_CNT] += 1;
            s[SUBSET_SCORE] += peaks[(int)c.idx_b] + c.score;
          }
        }
        if (found == 0) {
          std::vector<double> row(SUBSET_SIZE, 0.0);
          row[part_a] = c.idx_a;
          row[part_b] = c.idx_b;
          row[SUBSET_CNT] = 2;
          row[SUBSET_SCORE] = peaks[(int)c.idx_a] + peaks[(int)c.idx_b] + c.score;
          subsets.push_back(std::move(row));
        }
      }
    }
  }

  // filter + joint emission (rtpose.cpp:1044-1070)
  int cnt = 0;
  for (const auto& s : subsets) {
    if (s[SUBSET_CNT] >= min_subset_cnt &&
        (s[SUBSET_SCORE] / s[SUBSET_CNT]) > min_subset_score) {
      float* person = joints_out + (size_t)cnt * num_parts * 3;
      for (int j = 0; j < num_parts; ++j) {
        const int idx = (int)s[j];
        if (idx) {
          person[j * 3 + 2] = peaks[idx];
          person[j * 3 + 1] = peaks[idx - 1] * scale_y;
          person[j * 3 + 0] = peaks[idx - 2] * scale_x;
        } else {
          person[j * 3 + 0] = person[j * 3 + 1] = person[j * 3 + 2] = 0.f;
        }
      }
      if (++cnt == max_people) break;
    }
  }
  return cnt;
}

}  // extern "C"
