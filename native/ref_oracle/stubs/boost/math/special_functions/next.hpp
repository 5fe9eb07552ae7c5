// boost::math::nextafter -> std::nextafter.
#ifndef REF_ORACLE_BOOST_MATH_NEXT_HPP_
#define REF_ORACLE_BOOST_MATH_NEXT_HPP_
#include <cmath>
namespace boost {
namespace math {
template <typename T>
T nextafter(T x, T y) {
  return std::nextafter(x, y);
}
}  // namespace math
}  // namespace boost
#endif
