// Minimal boost.thread surface for the compiled reference subset:
// thread_specific_ptr (common.cpp's per-thread Caffe singleton) via
// pthread keys, mutex as std::mutex.
#ifndef REF_ORACLE_BOOST_THREAD_HPP_
#define REF_ORACLE_BOOST_THREAD_HPP_
#include <pthread.h>

#include <mutex>

namespace boost {

// a real class (layer.hpp forward-declares `class mutex`), with the
// boost-style scoped_lock alias caffe uses
class mutex : public std::mutex {
 public:
  using scoped_lock = std::unique_lock<std::mutex>;
};

template <typename T>
class thread_specific_ptr {
 public:
  thread_specific_ptr() { pthread_key_create(&key_, &destroy); }
  ~thread_specific_ptr() { pthread_key_delete(key_); }
  T* get() const { return static_cast<T*>(pthread_getspecific(key_)); }
  T* operator->() const { return get(); }
  T& operator*() const { return *get(); }
  void reset(T* p = nullptr) {
    T* old = get();
    if (old && old != p) delete old;
    pthread_setspecific(key_, p);
  }
  T* release() {
    T* p = get();
    pthread_setspecific(key_, nullptr);
    return p;
  }

 private:
  static void destroy(void* p) { delete static_cast<T*>(p); }
  pthread_key_t key_;
};

}  // namespace boost
#endif
