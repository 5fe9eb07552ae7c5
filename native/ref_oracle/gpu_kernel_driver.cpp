/* Driver for the GPU-kernel oracle: runs the reference's REAL
 * NmsLayer::Forward_gpu (src/caffe/cpm/layers/nms_layer.cu:117-184) and
 * ImResizeLayer::Forward_gpu (imresize_layer.cu:158-193) — compiled from
 * unmodified source via the cuda_emu shim — over raw float32 tensors, so
 * the repo's TPU kernels can be parity-tested against the executed
 * reference GPU path (which rtpose.bin actually uses; the reference's own
 * CPU fallbacks are documented as divergent).
 *
 * Usage:
 *   gpu_oracle nms      in.raw out.raw N C H W num_parts max_peaks thr
 *   gpu_oracle imresize in.raw out.raw N C H W factor target_w target_h \
 *                       start_scale scale_gap
 *
 * in.raw: float32 little-endian NCHW.  out.raw: the layer's top blob —
 * [N, num_parts, max_peaks+1, 3] for nms; [1, C, target_h, target_w] for
 * imresize (factor != 0 multiplies bottom H/W instead, as in the layer's
 * Reshape, imresize_layer.cpp:28-33).
 */
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "caffe/blob.hpp"
#include "caffe/common.hpp"
#include "caffe/cpm/layers/imresize_layer.hpp"
#include "caffe/cpm/layers/nms_layer.hpp"
#include "caffe/proto/caffe.pb.h"

using caffe::Blob;
using caffe::Caffe;
using caffe::LayerParameter;

namespace {

void read_raw(const char* path, float* dst, size_t n) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path);
    exit(2);
  }
  if (fread(dst, sizeof(float), n, f) != n) {
    fprintf(stderr, "short read from %s (want %zu floats)\n", path, n);
    exit(2);
  }
  fclose(f);
}

void write_raw(const char* path, const float* src, size_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) {
    fprintf(stderr, "cannot open %s for write\n", path);
    exit(2);
  }
  fwrite(src, sizeof(float), n, f);
  fclose(f);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: gpu_oracle nms|imresize ...\n");
    return 2;
  }
  const std::string mode = argv[1];
  Caffe::set_mode(Caffe::GPU);

  if (mode == "nms") {
    if (argc != 11) {
      fprintf(stderr,
              "usage: gpu_oracle nms in out N C H W num_parts max_peaks "
              "threshold\n");
      return 2;
    }
    const char *in = argv[2], *out = argv[3];
    const int N = atoi(argv[4]), C = atoi(argv[5]), H = atoi(argv[6]),
              W = atoi(argv[7]);
    const int num_parts = atoi(argv[8]), max_peaks = atoi(argv[9]);
    const float threshold = static_cast<float>(atof(argv[10]));

    LayerParameter param;
    param.set_name("nms");
    param.set_type("Nms");
    caffe::NmsParameter* np = param.mutable_nms_param();
    np->set_threshold(threshold);
    np->set_num_parts(num_parts);
    np->set_max_peaks(max_peaks);

    Blob<float> bottom(N, C, H, W);
    read_raw(in, bottom.mutable_cpu_data(), bottom.count());
    Blob<float> top;
    std::vector<Blob<float>*> bottoms{&bottom}, tops{&top};
    caffe::NmsLayer<float> layer(param);
    layer.SetUp(bottoms, tops);
    layer.Forward(bottoms, tops);
    write_raw(out, top.cpu_data(), top.count());
    printf("nms top shape %d %d %d %d\n", top.shape(0), top.shape(1),
           top.shape(2), top.shape(3));
    return 0;
  }

  if (mode == "imresize") {
    if (argc != 13) {
      fprintf(stderr,
              "usage: gpu_oracle imresize in out N C H W factor target_w "
              "target_h start_scale scale_gap\n");
      return 2;
    }
    const char *in = argv[2], *out = argv[3];
    const int N = atoi(argv[4]), C = atoi(argv[5]), H = atoi(argv[6]),
              W = atoi(argv[7]);
    const int factor = atoi(argv[8]);
    const int target_w = atoi(argv[9]), target_h = atoi(argv[10]);
    const float start_scale = static_cast<float>(atof(argv[11]));
    const float scale_gap = static_cast<float>(atof(argv[12]));

    LayerParameter param;
    param.set_name("resize");
    param.set_type("ImResize");
    caffe::ImResizeParameter* rp = param.mutable_imresize_param();
    rp->set_factor(factor);
    rp->set_target_spatial_width(target_w);
    rp->set_target_spatial_height(target_h);
    rp->set_start_scale(start_scale);
    rp->set_scale_gap(scale_gap);

    Blob<float> bottom(N, C, H, W);
    read_raw(in, bottom.mutable_cpu_data(), bottom.count());
    Blob<float> top;
    std::vector<Blob<float>*> bottoms{&bottom}, tops{&top};
    caffe::ImResizeLayer<float> layer(param);
    layer.SetUp(bottoms, tops);
    layer.Forward(bottoms, tops);
    write_raw(out, top.cpu_data(), top.count());
    printf("imresize top shape %d %d %d %d\n", top.shape(0), top.shape(1),
           top.shape(2), top.shape(3));
    return 0;
  }

  fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 2;
}
