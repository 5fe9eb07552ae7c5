/* Driver for the render oracle: executes the reference's REAL skeleton /
 * heatmap / PAF render kernels (src/rtpose/renderFunctions.cu, compiled
 * UNMODIFIED apart from cu_preprocess.py's syntactic <<<>>> rewrite via
 * the cuda_emu shim) through the same host wrappers rtpose.cpp's render()
 * calls (examples/rtpose/rtpose.cpp:271-301):
 *
 *   render_mpi_parts   (renderFunctions.cu:331-389)
 *   render_coco_parts  (renderFunctions.cu:978-1036)
 *   render_coco_aff    (renderFunctions.cu:1038-1080)
 *
 * so pose/render.py can be pixel-parity-tested against the executed
 * reference GPU render path (the reference has no CPU fallback at all for
 * rendering).
 *
 * Usage:
 *   render_oracle mpi  canvas.raw poses.raw heat.raw out.raw \
 *                      w_canvas h_canvas w_net h_net C boxsize num_people part
 *   render_oracle coco ... part googly
 *   render_oracle aff  ... part num_parts_accum
 *
 * canvas.raw: float32 planar BGR (3, h_canvas, w_canvas) — the reference's
 * canvas layout (renderFunctions.cu:168-170).  poses.raw: float32
 * (num_people, num_parts, 3) x/y/score in canvas coords.  heat.raw:
 * float32 (C, h_net, w_net).  out.raw: the blended canvas, same layout.
 */
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "rtpose/renderFunctions.h"

namespace {

std::vector<float> read_raw(const char* path, size_t n) {
  std::vector<float> buf(n);
  FILE* f = fopen(path, "rb");
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path);
    exit(2);
  }
  if (fread(buf.data(), sizeof(float), n, f) != n) {
    fprintf(stderr, "short read from %s (want %zu floats)\n", path, n);
    exit(2);
  }
  fclose(f);
  return buf;
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
  if (argc != 14) {
    fprintf(stderr,
            "usage: render_oracle mpi|coco|aff canvas poses heat out "
            "w_canvas h_canvas w_net h_net C boxsize num_people "
            "part|part|part googly|accum-last-arg\n");
    return 2;
  }
  const std::string mode = argv[1];
  const char *canvas_path = argv[2], *poses_path = argv[3],
             *heat_path = argv[4], *out_path = argv[5];
  const int w_canvas = atoi(argv[6]), h_canvas = atoi(argv[7]);
  const int w_net = atoi(argv[8]), h_net = atoi(argv[9]);
  const int C = atoi(argv[10]);
  const int boxsize = atoi(argv[11]);
  const int np = atoi(argv[12]);

  const int num_parts = (mode == "mpi") ? 15 : 18;
  std::vector<float> canvas =
      read_raw(canvas_path, (size_t)3 * h_canvas * w_canvas);
  std::vector<float> poses =
      read_raw(poses_path, (size_t)(np > 0 ? np : 1) * num_parts * 3);
  std::vector<float> heat = read_raw(heat_path, (size_t)C * h_net * w_net);
  std::vector<int> num_people{np};

  // last CLI arg doubles as part for all modes; the 14th is googly/accum
  const int part_arg = atoi(argv[13]);

  if (mode == "mpi") {
    render_mpi_parts(canvas.data(), w_canvas, h_canvas, w_net, h_net,
                     heat.data(), boxsize, /*centers=*/nullptr, poses.data(),
                     num_people, part_arg);
  } else if (mode == "coco") {
    // part_arg packs part*10 + googly so the arg count stays uniform
    render_coco_parts(canvas.data(), w_canvas, h_canvas, w_net, h_net,
                      heat.data(), boxsize, /*centers=*/nullptr, poses.data(),
                      num_people, part_arg / 10, (part_arg % 10) != 0);
  } else if (mode == "aff") {
    // part_arg packs part*100 + num_parts_accum
    render_coco_aff(canvas.data(), w_canvas, h_canvas, w_net, h_net,
                    heat.data(), boxsize, /*centers=*/nullptr, poses.data(),
                    num_people, part_arg / 100, part_arg % 100);
  } else {
    fprintf(stderr, "unknown mode %s\n", mode.c_str());
    return 2;
  }

  write_raw(out_path, canvas.data(), canvas.size());
  printf("render %s done (%dx%d canvas, %d people)\n", mode.c_str(), w_canvas,
         h_canvas, np);
  return 0;
}
