// Driver for the REFERENCE producer oracle: links the unmodified
// examples/rtpose/rtpose.cpp translation unit (same rtpose.o as the
// connect oracle) and runs its ACTUAL image-directory producer —
// getFrameFromDir (rtpose.cpp:302-392): cv::imread, aspect-preserving
// warpAffine to display resolution, the per-scale CV_INTER_AREA resize
// loop, and process_and_pad_image's center-pad + /256-0.5 normalize
// (rtpose.cpp:239-269,355-368) — then dumps each produced Frame's net
// input, display canvas, and scale so the repo's pose/preprocess.py can
// be verified against executed reference source starting at the image
// FILE, not at a pre-agreed net input (tests/test_ref_image_e2e.py).
//
// Usage:
//   ref_producer list.txt disp_w disp_h net_w net_h num_scales
//                start_scale scale_gap out_prefix
//
//   list.txt: one image path per line (becomes global.image_list)
//   per frame k (0-based video_frame_number):
//     {prefix}.{k:06d}.input.raw   float32 [num_scales][3][net_h][net_w]
//     {prefix}.{k:06d}.canvas.raw  float32 [3][disp_h][disp_w] (unnormalized)
//   stdout: one "frame <k> scale <scale:.9g> ori <w> <h>" line per frame
//   (scale is the frame's f32-narrowed display scale, frame.h:24)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include "caffe/common.hpp"
#include "caffe/util/blocking_queue.hpp"
#include "caffe/cpm/frame.h"

// ---- interface mirrors for rtpose.cpp's TU-local types/globals ----------
// (identical layout to connect_driver.cpp's mirror; the reference keeps
// these in the .cpp, so redeclaring the exact layout is the only way to
// reach them without editing the file)
struct Global {
    caffe::BlockingQueue<Frame> input_queue;
    caffe::BlockingQueue<Frame> output_queue;
    caffe::BlockingQueue<Frame> output_queue_ordered;
    caffe::BlockingQueue<Frame> output_queue_mated;
    std::priority_queue<int, std::vector<int>, std::greater<int> > dropped_index;
    std::vector< std::string > image_list;
    std::mutex mutex;
    int part_to_show;
    bool quit_threads;
    float nms_threshold;
    int connect_min_subset_cnt;
    float connect_min_subset_score;
    float connect_inter_threshold;
    int connect_inter_min_above_threshold;

    struct UIState {
        bool is_fullscreen;
        bool is_video_paused;
        bool is_shift_down;
        bool is_googly_eyes;
        int current_frame;
        int seek_to_frame;
        double fps;
    };
    UIState uistate;
};

extern Global global;
extern int NET_RESOLUTION_WIDTH;
extern int NET_RESOLUTION_HEIGHT;
extern int DISPLAY_RESOLUTION_WIDTH;
extern int DISPLAY_RESOLUTION_HEIGHT;
extern int BATCH_SIZE;       // = num_scales (rtpose.cpp:81,1701)
extern double START_SCALE;
extern double SCALE_GAP;

void* getFrameFromDir(void* i);

// ---- link stubs: symbols rtpose.cpp references but this driver never runs
void render_mpi_parts(float*, int, int, int, int, float*, int, float*,
                      float*, std::vector<int>, int) {}
void render_coco_parts(float*, int, int, int, int, float*, int, float*,
                       float*, std::vector<int>, int, bool) {}
void render_coco_aff(float*, int, int, int, int, float*, int, float*,
                     float*, std::vector<int>, int, int) {}

// BlockingQueue<Frame>: local mutex implementation to satisfy the link
// (same rationale as connect_driver.cpp — the reference instantiates it in
// blocking_queue.cpp, which drags in the whole data pipeline).  Here the
// queue IS exercised: getFrameFromDir pushes, main pops.
namespace caffe {
template <typename T>
class BlockingQueue<T>::sync {
 public:
  std::mutex mutex_;
};

template <typename T>
BlockingQueue<T>::BlockingQueue() : sync_(new sync()) {}
template <typename T>
void BlockingQueue<T>::push(const T& t) {
  std::lock_guard<std::mutex> lk(sync_->mutex_);
  queue_.push(t);
}
template <typename T>
bool BlockingQueue<T>::try_pop(T* t) {
  std::lock_guard<std::mutex> lk(sync_->mutex_);
  if (queue_.empty()) return false;
  *t = queue_.front();
  queue_.pop();
  return true;
}
template <typename T>
T BlockingQueue<T>::pop(const std::string&) {
  for (;;) {
    T t;
    if (try_pop(&t)) return t;
  }
}
template <typename T>
size_t BlockingQueue<T>::size() const {
  std::lock_guard<std::mutex> lk(sync_->mutex_);
  return queue_.size();
}
template class BlockingQueue<Frame>;
}  // namespace caffe

static void write_raw(const std::string& path, const float* data, size_t n) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(2); }
  std::fwrite(data, sizeof(float), n, f);
  std::fclose(f);
}

int main(int argc, char** argv) {
  if (argc < 10) {
    std::fprintf(stderr,
        "usage: %s list.txt disp_w disp_h net_w net_h num_scales "
        "start_scale scale_gap out_prefix\n", argv[0]);
    return 2;
  }
  std::ifstream list(argv[1]);
  std::string line;
  while (std::getline(list, line)) {
    if (!line.empty()) global.image_list.push_back(line);
  }
  DISPLAY_RESOLUTION_WIDTH = std::atoi(argv[2]);
  DISPLAY_RESOLUTION_HEIGHT = std::atoi(argv[3]);
  NET_RESOLUTION_WIDTH = std::atoi(argv[4]);
  NET_RESOLUTION_HEIGHT = std::atoi(argv[5]);
  BATCH_SIZE = std::atoi(argv[6]);
  START_SCALE = std::atof(argv[7]);
  SCALE_GAP = std::atof(argv[8]);
  const std::string prefix = argv[9];

  global.quit_threads = false;
  global.uistate.is_video_paused = false;
  global.uistate.current_frame = 0;

  // the producer drains the queues before quitting (rtpose.cpp:377-388),
  // so it must run concurrently with the consuming loop below
  std::thread producer(getFrameFromDir, nullptr);

  const size_t n = global.image_list.size();
  const size_t in_elems =
      (size_t)BATCH_SIZE * 3 * NET_RESOLUTION_HEIGHT * NET_RESOLUTION_WIDTH;
  const size_t canvas_elems =
      (size_t)3 * DISPLAY_RESOLUTION_HEIGHT * DISPLAY_RESOLUTION_WIDTH;
  for (size_t k = 0; k < n; ++k) {
    Frame f = global.input_queue.pop("");
    char tag[32];
    std::snprintf(tag, sizeof(tag), ".%06d", f.video_frame_number);
    write_raw(prefix + tag + ".input.raw", f.data, in_elems);
    write_raw(prefix + tag + ".canvas.raw", f.data_for_mat, canvas_elems);
    std::printf("frame %d scale %.9g ori %d %d\n", f.video_frame_number,
                (double)f.scale, f.ori_width, f.ori_height);
    delete[] f.data;
    delete[] f.data_for_mat;
    delete[] f.data_for_wrap;
  }
  producer.join();
  std::printf("ok %zu\n", n);
  return 0;
}
