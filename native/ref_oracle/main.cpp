// Parity oracle driver: runs the REFERENCE Caffe implementation (compiled
// CPU_ONLY from /root/reference sources, unmodified) on a prototxt +
// caffemodel + raw float input, and dumps named blobs so the TPU
// reimplementation can be checked against an independent executable.
//
// Usage:
//   ref_oracle <deploy.prototxt> <weights.caffemodel|-> <input.raw>
//              <out_prefix> <blob_name> [blob_name...]
//
// input.raw: float32 values matching the net's first input blob count.
// Writes <out_prefix>.<blob>.raw (float32) and prints "<blob> <shape...>"
// lines to stdout.
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#include "caffe/blob.hpp"
#include "caffe/common.hpp"
#include "caffe/net.hpp"

int main(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr,
                 "usage: %s proto weights|- input.raw out_prefix blob...\n",
                 argv[0]);
    return 2;
  }
  const std::string proto = argv[1];
  const std::string weights = argv[2];
  const std::string input_path = argv[3];
  const std::string out_prefix = argv[4];

  caffe::Caffe::set_mode(caffe::Caffe::CPU);
  caffe::Net<float> net(proto, caffe::TEST);
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

  for (int i = 5; i < argc; ++i) {
    const std::string name = argv[i];
    if (!net.has_blob(name)) {
      std::fprintf(stderr, "no blob '%s'\n", name.c_str());
      return 2;
    }
    const boost::shared_ptr<caffe::Blob<float> > b = net.blob_by_name(name);
    std::ofstream f(out_prefix + "." + name + ".raw", std::ios::binary);
    f.write(reinterpret_cast<const char*>(b->cpu_data()),
            sizeof(float) * b->count());
    std::printf("%s", name.c_str());
    for (int d = 0; d < b->num_axes(); ++d) std::printf(" %d", b->shape(d));
    std::printf("\n");
  }
  return 0;
}
