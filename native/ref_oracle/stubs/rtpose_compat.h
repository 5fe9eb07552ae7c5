/* Force-included when compiling the reference examples/rtpose/rtpose.cpp
 * host code against OpenCV 4 and without CUDA: modern module headers,
 * the removed C-API constant names, and host-memory cuda* shims (the
 * compiled GPU-thread paths are never executed by the connect driver —
 * only connectLimbs/connectLimbsCOCO/distanceThresholdPeaks run). */
#ifndef REF_ORACLE_RTPOSE_COMPAT_H_
#define REF_ORACLE_RTPOSE_COMPAT_H_

#include <cstdlib>
#include <cstring>

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgproc/types_c.h>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/videoio.hpp>
#include <opencv2/highgui.hpp>

#ifndef CV_CAP_PROP_FPS
#define CV_CAP_PROP_FPS cv::CAP_PROP_FPS
#define CV_CAP_PROP_FRAME_COUNT cv::CAP_PROP_FRAME_COUNT
#define CV_CAP_PROP_FRAME_WIDTH cv::CAP_PROP_FRAME_WIDTH
#define CV_CAP_PROP_FRAME_HEIGHT cv::CAP_PROP_FRAME_HEIGHT
#define CV_CAP_PROP_POS_FRAMES cv::CAP_PROP_POS_FRAMES
#endif
#ifndef CV_IMWRITE_JPEG_QUALITY
#define CV_IMWRITE_JPEG_QUALITY cv::IMWRITE_JPEG_QUALITY
#endif
#ifndef CV_LOAD_IMAGE_COLOR
#define CV_LOAD_IMAGE_COLOR cv::IMREAD_COLOR
#endif
#ifndef CV_WINDOW_NORMAL
#define CV_WINDOW_NORMAL cv::WINDOW_NORMAL
#define CV_WINDOW_KEEPRATIO cv::WINDOW_KEEPRATIO
#define CV_WINDOW_FULLSCREEN cv::WINDOW_FULLSCREEN
#define CV_WND_PROP_FULLSCREEN cv::WND_PROP_FULLSCREEN
#endif

/* ---- cuda runtime shims (host malloc/memcpy) ---- */
typedef int cudaError_t;
enum cudaMemcpyKind {
  cudaMemcpyHostToHost = 0,
  cudaMemcpyHostToDevice = 1,
  cudaMemcpyDeviceToHost = 2,
  cudaMemcpyDeviceToDevice = 3,
};

static inline cudaError_t cudaMalloc(void** p, size_t n) {
  *p = std::malloc(n);
  return 0;
}
template <typename T>
static inline cudaError_t cudaMalloc(T** p, size_t n) {
  *p = static_cast<T*>(std::malloc(n));
  return 0;
}
static inline cudaError_t cudaFree(void* p) {
  std::free(p);
  return 0;
}
static inline cudaError_t cudaMemcpy(void* dst, const void* src, size_t n,
                                     cudaMemcpyKind) {
  std::memcpy(dst, src, n);
  return 0;
}
static inline cudaError_t cudaDeviceSynchronize() { return 0; }

#endif  // REF_ORACLE_RTPOSE_COMPAT_H_
