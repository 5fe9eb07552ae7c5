// Parity oracle driver: runs the REFERENCE Caffe implementation (compiled
// CPU_ONLY from /root/reference sources, unmodified) on a prototxt +
// caffemodel + raw float input, and dumps named blobs so the TPU
// reimplementation can be checked against an independent executable.
//
// Usage:
//   ref_oracle [--train] <deploy.prototxt> <weights.caffemodel|->
//              <input.raw> <out_prefix> <name> [name...]
//
// input.raw: float32 values filling every input blob, in net order.
// Each <name> is one of:
//   blob          forward activation (cpu_data)
//   grad:blob     blob gradient (cpu_diff) after net.Backward()
//   pgrad:layer   that layer's param gradients, concatenated in blob order
// Requesting any grad runs Backward (set force_backward: true in the proto
// for input-blob gradients).  Writes <out_prefix>.<name>.raw (float32,
// ':' replaced by '_') and prints "<name> <shape...>" lines to stdout.
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#include "caffe/blob.hpp"
#include "caffe/common.hpp"
#include "caffe/net.hpp"
#include "caffe/solver.hpp"
#include "caffe/solver_factory.hpp"
#include "caffe/util/io.hpp"
#include "caffe/util/upgrade_proto.hpp"

// Deterministic libc rand() interposition: the CPM augmentation chain
// (data_transformer.cpp:1432,1475,1530,1576) draws its dice directly from
// rand().  Linking these definitions ahead of libc pins the sequence to a
// documented LCG that the Python side replays exactly (RAND_MAX stays
// 2147483647).
static unsigned long long g_rand_state = 1;
extern "C" void srand(unsigned s) noexcept { g_rand_state = s; }
extern "C" int rand() noexcept {
  g_rand_state = (g_rand_state * 1103515245ULL + 12345ULL) % 2147483648ULL;
  return static_cast<int>(g_rand_state);
}

#ifdef REF_ORACLE_HAVE_OPENCV
#include "caffe/data_transformer.hpp"

// --transform_nv mode: run the REFERENCE CPM training transform (aug chain
// + label generation) on a serialized Datum and dump data+label buffers.
//   ref_oracle --transform_nv <transform.prototxt> <datum.bin> <seed>
//              <out_prefix>
static int run_transform_nv(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr, "usage: %s --transform_nv transform.prototxt "
                 "datum.bin seed out_prefix\n", argv[0]);
    return 2;
  }
  caffe::Caffe::set_mode(caffe::Caffe::CPU);
  caffe::TransformationParameter param;
  if (!caffe::ReadProtoFromTextFile(argv[2], &param)) {
    std::fprintf(stderr, "cannot parse %s\n", argv[2]);
    return 2;
  }
  caffe::Datum datum;
  if (!caffe::ReadProtoFromBinaryFile(argv[3], &datum)) {
    std::fprintf(stderr, "cannot parse %s\n", argv[3]);
    return 2;
  }
  srand(static_cast<unsigned>(std::atoi(argv[4])));

  caffe::DataTransformer<float> dt(param, caffe::TRAIN);
  dt.InitRand();
  const int crop_x = param.crop_size_x();
  const int crop_y = param.crop_size_y();
  const int stride = param.stride();
  const int np = param.num_parts();
  // public entry CHECKs a 6-channel data blob (data_transformer.cpp:1177)
  // though only the first 3 channels are written
  caffe::Blob<float> data(1, 6, crop_y, crop_x);
  caffe::Blob<float> label(1, 2 * (np + 1), crop_y / stride,
                           crop_x / stride);
  caffe::caffe_set(data.count(), 0.f, data.mutable_cpu_data());
  caffe::caffe_set(label.count(), 0.f, label.mutable_cpu_data());
  dt.Transform_nv(datum, &data, &label, 0);

  const int grid = (crop_x / stride) * (crop_y / stride);
  const std::string out_prefix = argv[5];
  {
    std::ofstream f(out_prefix + ".data.raw", std::ios::binary);
    f.write(reinterpret_cast<const char*>(data.cpu_data()),
            sizeof(float) * 3 * crop_x * crop_y);
  }
  {
    std::ofstream f(out_prefix + ".label.raw", std::ios::binary);
    f.write(reinterpret_cast<const char*>(label.cpu_data()),
            sizeof(float) * 2 * (np + 1) * grid);
  }
  std::printf("data 3 %d %d\nlabel %d %d %d\n", crop_y, crop_x,
              2 * (np + 1), crop_y / stride, crop_x / stride);
  return 0;
}
#endif  // REF_ORACLE_HAVE_OPENCV

// --solve mode: run the REFERENCE Solver for N iterations and dump the
// final learnable params (concatenated, net param order) — the oracle for
// cross-implementation optimizer-trajectory parity.
//   ref_oracle --solve <solver.prototxt> <init.caffemodel|-> <iters>
//              <out_prefix>
static int run_solve(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr,
                 "usage: %s --solve solver.prototxt weights|- iters "
                 "out_prefix\n", argv[0]);
    return 2;
  }
  caffe::Caffe::set_mode(caffe::Caffe::CPU);
  caffe::SolverParameter solver_param;
  caffe::ReadSolverParamsFromTextFileOrDie(argv[2], &solver_param);
  boost::shared_ptr<caffe::Solver<float> > solver(
      caffe::SolverRegistry<float>::CreateSolver(solver_param));
  const std::string weights = argv[3];
  if (weights != "-") {
    solver->net()->CopyTrainedLayersFrom(weights);
  }
  solver->Step(std::atoi(argv[4]));
  const std::string out_prefix = argv[5];
  std::ofstream f(out_prefix + ".params.raw", std::ios::binary);
  int total = 0;
  const std::vector<caffe::Blob<float>*>& params =
      solver->net()->learnable_params();
  for (size_t i = 0; i < params.size(); ++i) {
    f.write(reinterpret_cast<const char*>(params[i]->cpu_data()),
            sizeof(float) * params[i]->count());
    total += params[i]->count();
  }
  std::printf("params %d\n", total);
  return 0;
}

// --upgrade mode: run the REFERENCE legacy-format migration
// (UpgradeNetAsNeeded: V0 padding dissolution + per-type param moves,
// V1 name/type tables, input-field modernization, upgrade_proto.cpp) on a
// prototxt and emit the upgraded NetParameter in text format.
//   ref_oracle --upgrade <net.prototxt> <out.prototxt>
static int run_upgrade(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s --upgrade net.prototxt out.prototxt\n",
                 argv[0]);
    return 2;
  }
  caffe::NetParameter param;
  if (!caffe::ReadProtoFromTextFile(argv[2], &param)) {
    std::fprintf(stderr, "cannot parse %s\n", argv[2]);
    return 2;
  }
  caffe::UpgradeNetAsNeeded(argv[2], &param);
  std::ofstream f(argv[3]);
  f << param.DebugString();
  return 0;
}

int main(int argc, char** argv) {
  if (argc > 1 && std::string(argv[1]) == "--solve") {
    return run_solve(argc, argv);
  }
  if (argc > 1 && std::string(argv[1]) == "--upgrade") {
    return run_upgrade(argc, argv);
  }
#ifdef REF_ORACLE_HAVE_OPENCV
  if (argc > 1 && std::string(argv[1]) == "--transform_nv") {
    return run_transform_nv(argc, argv);
  }
#endif
  int argi = 1;
  caffe::Phase phase = caffe::TEST;
  if (argc > 1 && std::string(argv[1]) == "--train") {
    phase = caffe::TRAIN;
    ++argi;
  }
  if (argc < argi + 5) {
    std::fprintf(stderr,
                 "usage: %s [--train] proto weights|- input.raw out_prefix "
                 "name...\n", argv[0]);
    return 2;
  }
  const std::string proto = argv[argi];
  const std::string weights = argv[argi + 1];
  const std::string input_path = argv[argi + 2];
  const std::string out_prefix = argv[argi + 3];
  const int first_name = argi + 4;

  caffe::Caffe::set_mode(caffe::Caffe::CPU);
  caffe::Net<float> net(proto, phase);
  if (weights != "-") {
    net.CopyTrainedLayersFrom(weights);
  }

  {
    // fill every input blob, in net order, from one concatenated raw file
    std::ifstream f(input_path, std::ios::binary);
    if (!f) {
      std::fprintf(stderr, "cannot open %s\n", input_path.c_str());
      return 2;
    }
    for (size_t i = 0; i < net.input_blobs().size(); ++i) {
      caffe::Blob<float>* input = net.input_blobs()[i];
      f.read(reinterpret_cast<char*>(input->mutable_cpu_data()),
             sizeof(float) * input->count());
      if (f.gcount() !=
          static_cast<std::streamsize>(sizeof(float) * input->count())) {
        std::fprintf(stderr, "input.raw size mismatch (input %zu wants %d "
                     "floats)\n", i, input->count());
        return 2;
      }
    }
  }

  net.Forward();
  bool backward_done = false;
  for (int i = first_name; i < argc && !backward_done; ++i) {
    const std::string name = argv[i];
    if (name.rfind("grad:", 0) == 0 || name.rfind("pgrad:", 0) == 0) {
      net.Backward();
      backward_done = true;
    }
  }

  for (int i = first_name; i < argc; ++i) {
    std::string name = argv[i];
    std::string fname = name;
    for (size_t c = 0; c < fname.size(); ++c)
      if (fname[c] == ':') fname[c] = '_';
    std::ofstream f(out_prefix + "." + fname + ".raw", std::ios::binary);
    std::printf("%s", name.c_str());
    if (name.rfind("pgrad:", 0) == 0) {
      const std::string lname = name.substr(6);
      if (!net.has_layer(lname)) {
        std::fprintf(stderr, "no layer '%s'\n", lname.c_str());
        return 2;
      }
      const boost::shared_ptr<caffe::Layer<float> > layer =
          net.layer_by_name(lname);
      int total = 0;
      for (size_t b = 0; b < layer->blobs().size(); ++b) {
        caffe::Blob<float>* blob = layer->blobs()[b].get();
        f.write(reinterpret_cast<const char*>(blob->cpu_diff()),
                sizeof(float) * blob->count());
        total += blob->count();
      }
      std::printf(" %d\n", total);
      continue;
    }
    const bool want_diff = name.rfind("grad:", 0) == 0;
    const std::string bname = want_diff ? name.substr(5) : name;
    if (!net.has_blob(bname)) {
      std::fprintf(stderr, "no blob '%s'\n", bname.c_str());
      return 2;
    }
    const boost::shared_ptr<caffe::Blob<float> > b = net.blob_by_name(bname);
    f.write(reinterpret_cast<const char*>(
                want_diff ? b->cpu_diff() : b->cpu_data()),
            sizeof(float) * b->count());
    for (int d = 0; d < b->num_axes(); ++d) std::printf(" %d", b->shape(d));
    std::printf("\n");
  }
  return 0;
}
