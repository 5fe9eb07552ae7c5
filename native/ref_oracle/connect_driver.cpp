// Driver for the REFERENCE limb-assembly oracle: links the unmodified
// examples/rtpose/rtpose.cpp translation unit (compiled CPU-only with stub
// headers, its main() renamed away) and calls its connectLimbs /
// connectLimbsCOCO / distanceThresholdPeaks host functions on raw inputs,
// so caffe_rtpose_tpu/pose/connect.py can be cross-verified against the
// reference's own greedy matching code (rtpose.cpp:549-1076).
//
// Usage:
//   ref_connect {coco|mpi|dist} heatmap.raw peaks.raw max_peaks
//               net_w net_h disp_w disp_h inter_thr inter_min_above
//               min_subset_cnt min_subset_score out.raw
//
//   heatmap.raw: float32 [C][net_h][net_w] (the resized_map layout; C must
//                cover every mapIdx channel of the model)
//   peaks.raw:   float32 [num_parts][max_peaks+1][3], slot 0 = count
//   out.raw:     int32 count, then float32 joints [count][num_parts][3]
//   mode dist:   runs distanceThresholdPeaks instead; out.raw = filtered
//                peaks buffer [num_parts][max_peaks+1][3]

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <vector>

#include "caffe/common.hpp"
#include "caffe/util/blocking_queue.hpp"
#include "caffe/cpm/frame.h"
#include "rtpose/modelDescriptor.h"
#include "rtpose/modelDescriptorFactory.h"
#include "rtpose/renderFunctions.h"

// ---- interface mirrors for rtpose.cpp's TU-local types/globals ----------
// (the reference keeps these in the .cpp; redeclaring the exact layout is
// the only way to reach them without editing the file)
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

int connectLimbs(std::vector< std::vector<double>> &subset,
                 std::vector< std::vector< std::vector<double> > > &connection,
                 const float *heatmap_pointer, const float *peaks,
                 int max_peaks, float *joints,
                 ModelDescriptor *model_descriptor);
int connectLimbsCOCO(std::vector< std::vector<double>> &subset,
                     std::vector< std::vector< std::vector<double> > > &connection,
                     const float *heatmap_pointer, const float *in_peaks,
                     int max_peaks, float *joints,
                     ModelDescriptor *model_descriptor);
int distanceThresholdPeaks(const float *in_peaks, int max_peaks,
                           float *peaks, ModelDescriptor *model_descriptor);

// ---- link stubs: symbols rtpose.cpp references but the driver never runs
void render_mpi_parts(float*, int, int, int, int, float*, int, float*,
                      float*, std::vector<int>, int) {}
void render_coco_parts(float*, int, int, int, int, float*, int, float*,
                       float*, std::vector<int>, int, bool) {}
void render_coco_aff(float*, int, int, int, int, float*, int, float*,
                     float*, std::vector<int>, int, int) {}

// BlockingQueue<Frame>: the reference instantiates this in
// blocking_queue.cpp, whose other instantiations drag in the whole data
// pipeline; a local mutex+condvar implementation satisfies the link (the
// driver itself never touches the queues).
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

static std::vector<float> read_raw(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<float> v(n / sizeof(float));
  if (std::fread(v.data(), 1, n, f) != (size_t)n) std::exit(2);
  std::fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 14) {
    std::fprintf(stderr,
        "usage: %s {coco|mpi|dist} heatmap.raw peaks.raw max_peaks net_w "
        "net_h disp_w disp_h inter_thr inter_min_above min_subset_cnt "
        "min_subset_score out.raw\n", argv[0]);
    return 2;
  }
  const std::string mode = argv[1];
  std::vector<float> heatmap = read_raw(argv[2]);
  std::vector<float> peaks = read_raw(argv[3]);
  const int max_peaks = std::atoi(argv[4]);
  NET_RESOLUTION_WIDTH = std::atoi(argv[5]);
  NET_RESOLUTION_HEIGHT = std::atoi(argv[6]);
  DISPLAY_RESOLUTION_WIDTH = std::atoi(argv[7]);
  DISPLAY_RESOLUTION_HEIGHT = std::atoi(argv[8]);
  global.connect_inter_threshold = std::atof(argv[9]);
  global.connect_inter_min_above_threshold = std::atoi(argv[10]);
  global.connect_min_subset_cnt = std::atoi(argv[11]);
  global.connect_min_subset_score = std::atof(argv[12]);
  const char* out_path = argv[13];

  std::unique_ptr<ModelDescriptor> model;
  ModelDescriptorFactory::createModelDescriptor(
      mode == "mpi" ? ModelDescriptorFactory::Type::MPI_15
                    : ModelDescriptorFactory::Type::COCO_18, model);

  FILE* out = std::fopen(out_path, "wb");
  if (!out) return 2;
  if (mode == "dist") {
    std::vector<float> filtered(peaks.size(), 0.f);
    distanceThresholdPeaks(peaks.data(), max_peaks, filtered.data(),
                           model.get());
    std::fwrite(filtered.data(), sizeof(float), filtered.size(), out);
  } else {
    const int num_parts = model->get_number_parts();
    std::vector< std::vector<double> > subset;
    std::vector< std::vector< std::vector<double> > > connection;
    std::vector<float> joints(RENDER_MAX_PEOPLE * num_parts * 3, 0.f);
    int cnt;
    if (mode == "mpi") {
      cnt = connectLimbs(subset, connection, heatmap.data(), peaks.data(),
                         max_peaks, joints.data(), model.get());
    } else {
      cnt = connectLimbsCOCO(subset, connection, heatmap.data(),
                             peaks.data(), max_peaks, joints.data(),
                             model.get());
    }
    int32_t c32 = cnt;
    std::fwrite(&c32, sizeof(c32), 1, out);
    std::fwrite(joints.data(), sizeof(float), (size_t)cnt * num_parts * 3,
                out);
  }
  std::fclose(out);
  std::printf("ok\n");
  return 0;
}
