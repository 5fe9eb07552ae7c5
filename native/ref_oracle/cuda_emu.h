/* CUDA kernel-language emulation for executing the UNMODIFIED reference
 * CPM .cu kernels (src/caffe/cpm/layers/nms_layer.cu, imresize_layer.cu)
 * on the host.  Force-included (with cu_preprocess.py's launch-site
 * rewrite) into the .cu translation units by build_gpu.sh.
 *
 * - __global__/__device__ qualifiers compile away; kernels become plain
 *   (template) functions.
 * - threadIdx/blockIdx/blockDim/gridDim are thread_local globals set by
 *   the launch drivers below.
 * - __shared__ becomes `static`: blocks run one at a time, so a single
 *   function-static instance shared by all (OS) threads of the current
 *   block has exactly CUDA shared-memory semantics.
 * - launch_serial: kernels with no __syncthreads() — every thread of every
 *   block runs to completion in a plain nested loop (fast path).
 * - launch_block_threads: kernels with __syncthreads() — each CUDA thread
 *   of a block is a live OS thread from a persistent pool;
 *   __syncthreads() is a barrier that releases when every thread of the
 *   block has either arrived or finished (threads that exit without
 *   reaching the barrier are not waited for, matching how the reference's
 *   divergent guard in writeResultKernel behaves on hardware).
 */
#ifndef REF_ORACLE_CUDA_EMU_H_
#define REF_ORACLE_CUDA_EMU_H_

/* getColorXY (renderFunctions.cu:98) calls ::isnan(float); CUDA device
 * code has it in the global namespace.  Including <math.h> (not just
 * <cmath>) makes libstdc++'s C-compatibility header inject the float/
 * double overloads into the global namespace portably — declaring our own
 * ::isnan(float) conflicts with libstdc++ >= 12's constexpr declaration. */
#include <math.h>

#include <cmath>
#include <functional>

#include "cuda_runtime.h" /* stub: dim3, cudaError_t, ... */

#define __global__
#define __device__
#define __host__
#define __forceinline__ inline
#define __launch_bounds__(...)
#define __shared__ static

extern thread_local dim3 threadIdx;
extern thread_local dim3 blockIdx;
extern thread_local dim3 blockDim;
extern thread_local dim3 gridDim;

void __syncthreads();

namespace cuda_emu {
void launch_serial(dim3 grid, dim3 block, const std::function<void()>& body);
void launch_block_threads(dim3 grid, dim3 block,
                          const std::function<void()>& body);
}  // namespace cuda_emu

#endif /* REF_ORACLE_CUDA_EMU_H_ */
