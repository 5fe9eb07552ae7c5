/* Host-emulation stub of cuRAND: generator creation succeeds (the Caffe
 * singleton creates one at startup, common.cpp:116); generation entry
 * points are never reached by the GPU-kernel oracle. */
#ifndef REF_ORACLE_CURAND_STUB_H_
#define REF_ORACLE_CURAND_STUB_H_

#include "cuda_runtime.h"

typedef enum {
  CURAND_STATUS_SUCCESS = 0,
  CURAND_STATUS_VERSION_MISMATCH = 100,
  CURAND_STATUS_NOT_INITIALIZED = 101,
  CURAND_STATUS_ALLOCATION_FAILED = 102,
  CURAND_STATUS_TYPE_ERROR = 103,
  CURAND_STATUS_OUT_OF_RANGE = 104,
  CURAND_STATUS_LENGTH_NOT_MULTIPLE = 105,
  CURAND_STATUS_DOUBLE_PRECISION_REQUIRED = 106,
  CURAND_STATUS_LAUNCH_FAILURE = 201,
  CURAND_STATUS_PREEXISTING_FAILURE = 202,
  CURAND_STATUS_INITIALIZATION_FAILED = 203,
  CURAND_STATUS_ARCH_MISMATCH = 204,
  CURAND_STATUS_INTERNAL_ERROR = 999,
} curandStatus_t;

typedef enum {
  CURAND_RNG_PSEUDO_DEFAULT = 100,
} curandRngType_t;

typedef struct curandGenerator_st* curandGenerator_t;

static inline curandStatus_t curandCreateGenerator(curandGenerator_t* g,
                                                   curandRngType_t) {
  *g = reinterpret_cast<curandGenerator_t>(0x1);
  return CURAND_STATUS_SUCCESS;
}
static inline curandStatus_t curandDestroyGenerator(curandGenerator_t) {
  return CURAND_STATUS_SUCCESS;
}
static inline curandStatus_t curandSetPseudoRandomGeneratorSeed(
    curandGenerator_t, unsigned long long) {
  return CURAND_STATUS_SUCCESS;
}
static inline curandStatus_t curandSetGeneratorOffset(curandGenerator_t,
                                                      unsigned long long) {
  return CURAND_STATUS_SUCCESS;
}
static inline curandStatus_t curandSetStream(curandGenerator_t, cudaStream_t) {
  return CURAND_STATUS_SUCCESS;
}

#endif /* REF_ORACLE_CURAND_STUB_H_ */
