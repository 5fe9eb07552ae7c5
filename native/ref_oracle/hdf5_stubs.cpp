// Aborting stand-ins for the HDF5 paths the oracle never uses (the oracle
// loads weights from a binary-proto caffemodel only).
#include <cstdio>
#include <cstdlib>
#include <string>

#include "hdf5.h"

#include "caffe/blob.hpp"
#include "caffe/util/hdf5.hpp"

namespace {
[[noreturn]] void die(const char* fn) {
  std::fprintf(stderr, "ref_oracle: HDF5 path '%s' is stubbed out\n", fn);
  std::abort();
}
}  // namespace

extern "C" {
hid_t H5Fopen(const char*, unsigned, hid_t) { die("H5Fopen"); }
hid_t H5Fcreate(const char*, unsigned, hid_t, hid_t) { die("H5Fcreate"); }
herr_t H5Fclose(hid_t) { die("H5Fclose"); }
hid_t H5Gopen2(hid_t, const char*, hid_t) { die("H5Gopen2"); }
hid_t H5Gcreate2(hid_t, const char*, hid_t, hid_t, hid_t) { die("H5Gcreate2"); }
herr_t H5Gclose(hid_t) { die("H5Gclose"); }
int H5Lexists(hid_t, const char*, hid_t) { die("H5Lexists"); }
}

namespace caffe {

template <typename Dtype>
void hdf5_load_nd_dataset_helper(hid_t, const char*, int, int, Blob<Dtype>*) {
  die("hdf5_load_nd_dataset_helper");
}
template <typename Dtype>
void hdf5_load_nd_dataset(hid_t, const char*, int, int, Blob<Dtype>*) {
  die("hdf5_load_nd_dataset");
}
template <typename Dtype>
void hdf5_save_nd_dataset(const hid_t, const std::string&, const Blob<Dtype>&,
                          bool) {
  die("hdf5_save_nd_dataset");
}
int hdf5_load_int(hid_t, const std::string&) { die("hdf5_load_int"); }
void hdf5_save_int(hid_t, const std::string&, int) { die("hdf5_save_int"); }
std::string hdf5_load_string(hid_t, const std::string&) {
  die("hdf5_load_string");
}
void hdf5_save_string(hid_t, const std::string&, const std::string&) {
  die("hdf5_save_string");
}
int hdf5_get_num_links(hid_t) { die("hdf5_get_num_links"); }
std::string hdf5_get_name_by_idx(hid_t, int) { die("hdf5_get_name_by_idx"); }

template void hdf5_load_nd_dataset_helper<float>(hid_t, const char*, int, int,
                                                 Blob<float>*);
template void hdf5_load_nd_dataset_helper<double>(hid_t, const char*, int, int,
                                                  Blob<double>*);
template void hdf5_load_nd_dataset<float>(hid_t, const char*, int, int,
                                          Blob<float>*);
template void hdf5_load_nd_dataset<double>(hid_t, const char*, int, int,
                                           Blob<double>*);
template void hdf5_save_nd_dataset<float>(const hid_t, const std::string&,
                                          const Blob<float>&, bool);
template void hdf5_save_nd_dataset<double>(const hid_t, const std::string&,
                                           const Blob<double>&, bool);

}  // namespace caffe

extern "C" int H5LTfind_dataset(hid_t, const char*) {
  die("H5LTfind_dataset");
}
