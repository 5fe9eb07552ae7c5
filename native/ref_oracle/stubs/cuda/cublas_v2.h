/* Host-emulation stub of cuBLAS: handle creation succeeds so the Caffe
 * singleton constructor (common.cpp:108-123) is happy; no math entry point
 * is ever reached (the GPU-kernel oracle only runs the CPM .cu kernels,
 * whose math is hand-written, and gpu_support.cpp implements the
 * caffe_gpu_* wrappers without cuBLAS). */
#ifndef REF_ORACLE_CUBLAS_STUB_H_
#define REF_ORACLE_CUBLAS_STUB_H_

#include "cuda_runtime.h"

typedef enum {
  CUBLAS_STATUS_SUCCESS = 0,
  CUBLAS_STATUS_NOT_INITIALIZED = 1,
  CUBLAS_STATUS_ALLOC_FAILED = 3,
  CUBLAS_STATUS_INVALID_VALUE = 7,
  CUBLAS_STATUS_ARCH_MISMATCH = 8,
  CUBLAS_STATUS_MAPPING_ERROR = 11,
  CUBLAS_STATUS_EXECUTION_FAILED = 13,
  CUBLAS_STATUS_INTERNAL_ERROR = 14,
  CUBLAS_STATUS_NOT_SUPPORTED = 15,
  CUBLAS_STATUS_LICENSE_ERROR = 16,
} cublasStatus_t;

typedef struct cublasContext* cublasHandle_t;

static inline cublasStatus_t cublasCreate(cublasHandle_t* h) {
  *h = reinterpret_cast<cublasHandle_t>(0x1);
  return CUBLAS_STATUS_SUCCESS;
}
static inline cublasStatus_t cublasDestroy(cublasHandle_t) {
  return CUBLAS_STATUS_SUCCESS;
}
static inline cublasStatus_t cublasSetStream(cublasHandle_t, cudaStream_t) {
  return CUBLAS_STATUS_SUCCESS;
}
static inline cublasStatus_t cublasGetStream(cublasHandle_t, cudaStream_t* s) {
  *s = nullptr;
  return CUBLAS_STATUS_SUCCESS;
}

#endif /* REF_ORACLE_CUBLAS_STUB_H_ */
