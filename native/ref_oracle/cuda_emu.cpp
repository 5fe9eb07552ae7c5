/* Implementation of the CUDA launch emulation declared in cuda_emu.h. */
#include "cuda_emu.h"

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <mutex>
#include <thread>
#include <vector>

thread_local dim3 threadIdx(0, 0, 0);
thread_local dim3 blockIdx(0, 0, 0);
thread_local dim3 blockDim(1, 1, 1);
thread_local dim3 gridDim(1, 1, 1);

namespace cuda_emu {

void launch_serial(dim3 grid, dim3 block, const std::function<void()>& body) {
  gridDim = grid;
  blockDim = block;
  for (unsigned bz = 0; bz < grid.z; ++bz)
    for (unsigned by = 0; by < grid.y; ++by)
      for (unsigned bx = 0; bx < grid.x; ++bx) {
        blockIdx = dim3(bx, by, bz);
        for (unsigned tz = 0; tz < block.z; ++tz)
          for (unsigned ty = 0; ty < block.y; ++ty)
            for (unsigned tx = 0; tx < block.x; ++tx) {
              threadIdx = dim3(tx, ty, tz);
              body();
            }
      }
}

namespace {

/* Persistent pool: one OS thread per CUDA thread of a block.  Blocks are
 * sequential (required by __shared__ -> static); threads of one block run
 * concurrently so __syncthreads() can rendezvous them. */
class BlockPool {
 public:
  static BlockPool& instance(unsigned nthreads) {
    static BlockPool* pool = nullptr;
    if (pool && pool->nthreads_ != nthreads) {
      delete pool;
      pool = nullptr;
    }
    if (!pool) pool = new BlockPool(nthreads);
    return *pool;
  }

  void run(dim3 grid, dim3 block, const std::function<void()>& body) {
    std::unique_lock<std::mutex> lk(m_);
    grid_ = grid;
    block_ = block;
    body_ = &body;
    nblocks_ =
        static_cast<uint64_t>(grid.x) * grid.y * static_cast<uint64_t>(grid.z);
    done_threads_ = 0;
    sync_arrived_ = 0;
    block_linear_ = 0;
    ++job_gen_;
    cv_work_.notify_all();
    cv_job_done_.wait(lk, [&] { return jobs_completed_ == job_gen_; });
    body_ = nullptr;
  }

  /* __syncthreads(): release when every thread of the block has arrived
   * or finished. */
  void sync() {
    std::unique_lock<std::mutex> lk(m_);
    uint64_t my_phase = sync_phase_;
    ++sync_arrived_;
    if (sync_arrived_ + done_threads_ == nthreads_) {
      sync_arrived_ = 0;
      ++sync_phase_;
      cv_sync_.notify_all();
    } else {
      cv_sync_.wait(lk, [&] { return sync_phase_ != my_phase; });
    }
  }

 private:
  explicit BlockPool(unsigned nthreads) : nthreads_(nthreads) {
    for (unsigned w = 0; w < nthreads_; ++w)
      workers_.emplace_back([this, w] { worker(w); });
  }
  ~BlockPool() {
    {
      std::lock_guard<std::mutex> lk(m_);
      shutdown_ = true;
      cv_work_.notify_all();
    }
    for (auto& t : workers_) t.join();
  }

  void worker(unsigned w) {
    uint64_t my_job = 0;
    std::unique_lock<std::mutex> lk(m_);
    for (;;) {
      cv_work_.wait(lk, [&] { return shutdown_ || job_gen_ != my_job; });
      if (shutdown_) return;
      my_job = job_gen_;
      gridDim = grid_;
      blockDim = block_;
      threadIdx = dim3(w % block_.x, (w / block_.x) % block_.y,
                       w / (block_.x * block_.y));
      const std::function<void()>* body = body_;
      while (block_linear_ < nblocks_) {
        uint64_t bl = block_linear_;
        blockIdx = dim3(static_cast<unsigned>(bl % grid_.x),
                        static_cast<unsigned>((bl / grid_.x) % grid_.y),
                        static_cast<unsigned>(bl / (grid_.x * grid_.y)));
        lk.unlock();
        (*body)();
        lk.lock();
        /* end-of-block barrier; the last thread in also releases any
         * stragglers still parked in sync(). */
        ++done_threads_;
        if (sync_arrived_ > 0 && sync_arrived_ + done_threads_ == nthreads_) {
          sync_arrived_ = 0;
          ++sync_phase_;
          cv_sync_.notify_all();
        }
        if (done_threads_ == nthreads_) {
          done_threads_ = 0;
          ++block_linear_;
          cv_block_.notify_all();
        } else {
          uint64_t my_block = bl;
          cv_block_.wait(lk, [&] { return block_linear_ != my_block; });
        }
      }
      ++threads_idle_;
      if (threads_idle_ == nthreads_) {
        threads_idle_ = 0;
        ++jobs_completed_;
        cv_job_done_.notify_all();
      }
    }
  }

  const unsigned nthreads_;
  std::vector<std::thread> workers_;
  std::mutex m_;
  std::condition_variable cv_work_, cv_sync_, cv_block_, cv_job_done_;
  dim3 grid_, block_;
  const std::function<void()>* body_ = nullptr;
  uint64_t nblocks_ = 0, block_linear_ = 0;
  unsigned done_threads_ = 0, sync_arrived_ = 0, threads_idle_ = 0;
  uint64_t sync_phase_ = 0, job_gen_ = 0, jobs_completed_ = 0;
  bool shutdown_ = false;
};

BlockPool* g_active_pool = nullptr;

}  // namespace

void launch_block_threads(dim3 grid, dim3 block,
                          const std::function<void()>& body) {
  unsigned nthreads = block.x * block.y * block.z;
  BlockPool& pool = BlockPool::instance(nthreads);
  g_active_pool = &pool;
  pool.run(grid, block, body);
  g_active_pool = nullptr;
}

}  // namespace cuda_emu

void __syncthreads() {
  if (cuda_emu::g_active_pool) cuda_emu::g_active_pool->sync();
}
