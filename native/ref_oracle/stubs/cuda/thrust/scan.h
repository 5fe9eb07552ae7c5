/* Host-emulation stub of thrust::exclusive_scan (the only thrust algorithm
 * the reference CPM kernels use, nms_layer.cu:176).  Serial prefix sum with
 * thrust's default init value of 0. */
#ifndef REF_ORACLE_THRUST_SCAN_STUB_H_
#define REF_ORACLE_THRUST_SCAN_STUB_H_

#include "device_ptr.h"

namespace thrust {

template <typename InIt, typename OutIt>
void exclusive_scan(InIt first, InIt last, OutIt out) {
  decltype(*first + *first) sum = 0;
  for (; first != last; ++first, ++out) {
    auto v = *first;
    *out = sum;
    sum += v;
  }
}

}  // namespace thrust

#endif /* REF_ORACLE_THRUST_SCAN_STUB_H_ */
