// Minimal boost::posix_time over std::chrono — just what
// util/benchmark.{hpp,cpp} touches (ptime, microsec_clock::local_time,
// subtraction yielding total_microseconds/total_milliseconds).
#ifndef REF_ORACLE_BOOST_PTIME_HPP_
#define REF_ORACLE_BOOST_PTIME_HPP_

#include <chrono>
#include <cstdint>

namespace boost {
namespace posix_time {

struct time_duration {
  std::int64_t us_;
  std::int64_t total_microseconds() const { return us_; }
  std::int64_t total_milliseconds() const { return us_ / 1000; }
};

struct ptime {
  std::chrono::steady_clock::time_point tp_;
  time_duration operator-(const ptime& other) const {
    return time_duration{std::chrono::duration_cast<std::chrono::microseconds>(
        tp_ - other.tp_).count()};
  }
};

struct microsec_clock {
  static ptime local_time() {
    return ptime{std::chrono::steady_clock::now()};
  }
};

}  // namespace posix_time
}  // namespace boost

#endif  // REF_ORACLE_BOOST_PTIME_HPP_
