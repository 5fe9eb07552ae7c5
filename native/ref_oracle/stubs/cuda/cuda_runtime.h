/* Host-emulation stub of the CUDA runtime API, used to compile the
 * reference caffe sources WITHOUT CPU_ONLY so that the real Forward_gpu
 * implementations in src/caffe/cpm/layers/{nms,imresize}_layer.cu can be
 * executed on the host.  "Device" memory is ordinary host memory; all
 * copies are memcpy; all stream/event/device calls succeed as no-ops.
 * Only on the include path of build_gpu.sh (never the CPU_ONLY oracles). */
#ifndef REF_ORACLE_CUDA_RUNTIME_STUB_H_
#define REF_ORACLE_CUDA_RUNTIME_STUB_H_

#include <cstdlib>
#include <cstring>

#define CUDA_VERSION 0 /* version-gated cublas enum cases compile out */

typedef enum cudaError { cudaSuccess = 0, cudaErrorUnknown = 1 } cudaError_t;

enum cudaMemcpyKind {
  cudaMemcpyHostToHost = 0,
  cudaMemcpyHostToDevice = 1,
  cudaMemcpyDeviceToHost = 2,
  cudaMemcpyDeviceToDevice = 3,
  cudaMemcpyDefault = 4,
};

typedef struct CUstream_st* cudaStream_t;
typedef struct CUevent_st* cudaEvent_t;

struct cudaDeviceProp {
  char name[256];
  size_t totalGlobalMem;
  size_t sharedMemPerBlock;
  int regsPerBlock;
  int warpSize;
  size_t memPitch;
  int maxThreadsPerBlock;
  int maxThreadsDim[3];
  int maxGridSize[3];
  int clockRate;
  size_t totalConstMem;
  int major, minor;
  size_t textureAlignment;
  int deviceOverlap;
  int multiProcessorCount;
  int kernelExecTimeoutEnabled;
};

struct dim3 {
  unsigned int x, y, z;
  dim3(unsigned int X = 1, unsigned int Y = 1, unsigned int Z = 1)
      : x(X), y(Y), z(Z) {}
};

/* vector types used by the render kernels (renderFunctions.cu:405-407,540) */
struct float2 {
  float x, y;
};
static inline float2 make_float2(float x, float y) {
  float2 v;
  v.x = x;
  v.y = y;
  return v;
}
struct float3 {
  float x, y, z;
};

/* render_pose_coco_heatmap2 calls __saturatef and DISCARDS the result
 * (renderFunctions.cu:817) — the stub only needs to exist. */
static inline float __saturatef(float x) {
  return x < 0.f ? 0.f : (x > 1.f ? 1.f : x);
}

/* Slack past the requested size mirrors real CUDA allocation granularity:
 * nms_register_kernel's rounded-up grid writes up to a few rows past the
 * workspace/top blob when W or H is not a multiple of 16 (phantom threads
 * hit the x==0/x==w-1/y==0/y==h-1 border branch with out-of-range x/y,
 * nms_layer.cu:43-45).  On hardware that lands in allocator padding; with
 * exact malloc it corrupts the heap. */
#define REF_ORACLE_CUDA_MALLOC_SLACK (1u << 16)
static inline cudaError_t cudaMalloc(void** p, size_t n) {
  *p = std::malloc(n + REF_ORACLE_CUDA_MALLOC_SLACK);
  return *p || n == 0 ? cudaSuccess : cudaErrorUnknown;
}
static inline cudaError_t cudaMallocHost(void** p, size_t n) {
  return cudaMalloc(p, n);
}
static inline cudaError_t cudaFree(void* p) {
  std::free(p);
  return cudaSuccess;
}
static inline cudaError_t cudaFreeHost(void* p) { return cudaFree(p); }
static inline cudaError_t cudaMemcpy(void* dst, const void* src, size_t n,
                                     cudaMemcpyKind) {
  std::memcpy(dst, src, n);
  return cudaSuccess;
}
static inline cudaError_t cudaMemcpyAsync(void* dst, const void* src, size_t n,
                                          cudaMemcpyKind,
                                          cudaStream_t = nullptr) {
  std::memcpy(dst, src, n);
  return cudaSuccess;
}
static inline cudaError_t cudaMemset(void* p, int v, size_t n) {
  std::memset(p, v, n);
  return cudaSuccess;
}
static inline cudaError_t cudaGetDevice(int* d) {
  *d = 0;
  return cudaSuccess;
}
static inline cudaError_t cudaSetDevice(int) { return cudaSuccess; }
static inline cudaError_t cudaGetDeviceCount(int* n) {
  *n = 1;
  return cudaSuccess;
}
static inline cudaError_t cudaGetDeviceProperties(cudaDeviceProp* p, int) {
  std::memset(p, 0, sizeof(*p));
  std::strcpy(p->name, "ref-oracle-host-emulation");
  p->warpSize = 32;
  p->maxThreadsPerBlock = 1024;
  return cudaSuccess;
}
static inline cudaError_t cudaDeviceSynchronize() { return cudaSuccess; }
static inline cudaError_t cudaStreamCreate(cudaStream_t* s) {
  *s = nullptr;
  return cudaSuccess;
}
static inline cudaError_t cudaStreamDestroy(cudaStream_t) {
  return cudaSuccess;
}
static inline cudaError_t cudaStreamSynchronize(cudaStream_t) {
  return cudaSuccess;
}
static inline cudaError_t cudaGetLastError() { return cudaSuccess; }
static inline cudaError_t cudaPeekAtLastError() { return cudaSuccess; }
static inline const char* cudaGetErrorString(cudaError_t e) {
  return e == cudaSuccess ? "no error" : "emulated cuda error";
}
static inline cudaError_t cudaDeviceCanAccessPeer(int* ok, int, int) {
  *ok = 0;
  return cudaSuccess;
}
static inline cudaError_t cudaDeviceEnablePeerAccess(int, unsigned) {
  return cudaSuccess;
}

#endif /* REF_ORACLE_CUDA_RUNTIME_STUB_H_ */
