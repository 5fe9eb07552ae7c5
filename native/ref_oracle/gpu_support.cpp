/* Host implementations of the caffe_gpu_* math wrappers referenced by the
 * reference TUs compiled WITHOUT CPU_ONLY (blob.cpp, syncedmem.cpp,
 * layer.hpp's loss branch).  "GPU" memory is host memory in this build, so
 * these are ordinary loops/memcpys; normally they live in
 * math_functions.cu over cuBLAS. */
#include <cmath>
#include <cstring>

#include "caffe/common.hpp"
#include "caffe/util/math_functions.hpp"

namespace caffe {

void caffe_gpu_memcpy(const size_t N, const void* X, void* Y) {
  if (X != Y) std::memcpy(Y, X, N);
}

template <typename Dtype>
void caffe_gpu_axpy(const int N, const Dtype alpha, const Dtype* X, Dtype* Y) {
  for (int i = 0; i < N; ++i) Y[i] += alpha * X[i];
}
template void caffe_gpu_axpy<float>(const int, const float, const float*,
                                    float*);
template void caffe_gpu_axpy<double>(const int, const double, const double*,
                                     double*);

template <typename Dtype>
void caffe_gpu_scal(const int N, const Dtype alpha, Dtype* X) {
  for (int i = 0; i < N; ++i) X[i] *= alpha;
}
template void caffe_gpu_scal<float>(const int, const float, float*);
template void caffe_gpu_scal<double>(const int, const double, double*);

template <typename Dtype>
void caffe_gpu_set(const int N, const Dtype alpha, Dtype* X) {
  for (int i = 0; i < N; ++i) X[i] = alpha;
}
template void caffe_gpu_set<int>(const int, const int, int*);
template void caffe_gpu_set<float>(const int, const float, float*);
template void caffe_gpu_set<double>(const int, const double, double*);

template <typename Dtype>
void caffe_gpu_add(const int N, const Dtype* a, const Dtype* b, Dtype* y) {
  for (int i = 0; i < N; ++i) y[i] = a[i] + b[i];
}
template void caffe_gpu_add<float>(const int, const float*, const float*,
                                   float*);
template void caffe_gpu_add<double>(const int, const double*, const double*,
                                    double*);

template <typename Dtype>
void caffe_gpu_dot(const int n, const Dtype* x, const Dtype* y, Dtype* out) {
  Dtype sum = 0;
  for (int i = 0; i < n; ++i) sum += x[i] * y[i];
  *out = sum;
}
template void caffe_gpu_dot<float>(const int, const float*, const float*,
                                   float*);
template void caffe_gpu_dot<double>(const int, const double*, const double*,
                                    double*);

template <typename Dtype>
void caffe_gpu_asum(const int n, const Dtype* x, Dtype* y) {
  Dtype sum = 0;
  for (int i = 0; i < n; ++i) sum += std::fabs(x[i]);
  *y = sum;
}
template void caffe_gpu_asum<float>(const int, const float*, float*);
template void caffe_gpu_asum<double>(const int, const double*, double*);

}  // namespace caffe
