/* Host-emulation stub of thrust::device_ptr — "device" memory is host
 * memory in the GPU-kernel oracle, so a device_ptr is a thin raw-pointer
 * wrapper with the iterator arithmetic nms_layer.cu uses. */
#ifndef REF_ORACLE_THRUST_DEVICE_PTR_STUB_H_
#define REF_ORACLE_THRUST_DEVICE_PTR_STUB_H_

#include <cstddef>

namespace thrust {

template <typename T>
class device_ptr {
 public:
  device_ptr() : p_(nullptr) {}
  explicit device_ptr(T* p) : p_(p) {}
  T* get() const { return p_; }
  T& operator*() const { return *p_; }
  T& operator[](std::ptrdiff_t i) const { return p_[i]; }
  device_ptr operator+(std::ptrdiff_t n) const { return device_ptr(p_ + n); }
  device_ptr operator-(std::ptrdiff_t n) const { return device_ptr(p_ - n); }
  std::ptrdiff_t operator-(const device_ptr& o) const { return p_ - o.p_; }
  device_ptr& operator++() { ++p_; return *this; }
  bool operator==(const device_ptr& o) const { return p_ == o.p_; }
  bool operator!=(const device_ptr& o) const { return p_ != o.p_; }

 private:
  T* p_;
};

template <typename T>
device_ptr<T> device_pointer_cast(T* p) {
  return device_ptr<T>(p);
}

}  // namespace thrust

#endif /* REF_ORACLE_THRUST_DEVICE_PTR_STUB_H_ */
