// Minimal glog replacement so the reference Caffe sources compile unmodified
// in this image (no glog available; see native/ref_oracle/build.sh).  Only
// the macro surface the compiled subset uses: CHECK*/LOG/DLOG/VLOG with
// ostream chaining; FATAL and failed CHECKs abort.
#ifndef REF_ORACLE_GLOG_LOGGING_H_
#define REF_ORACLE_GLOG_LOGGING_H_

#include <unistd.h>  // real glog drags this in; caffe relies on it (getpid)

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

namespace google {
inline void InitGoogleLogging(const char*) {}
inline void InstallFailureSignalHandler() {}
}  // namespace google

// glog's DECLARE'd flags (rtpose.cpp reads/sets FLAGS_logtostderr)
static int FLAGS_logtostderr = 1;

namespace ref_oracle_log {

enum Severity { INFO = 0, WARNING = 1, ERROR = 2, FATAL = 3 };

class LogMessage {
 public:
  LogMessage(Severity sev, bool emit = true) : sev_(sev), emit_(emit) {}
  ~LogMessage() {
    if (!emit_) return;
    if (sev_ >= ERROR) std::cerr << ss_.str() << std::endl;
    if (sev_ == FATAL) std::abort();
  }
  template <typename T>
  LogMessage& operator<<(const T& v) {
    ss_ << v;
    return *this;
  }
  LogMessage& operator<<(std::ostream& (*m)(std::ostream&)) {
    ss_ << m;
    return *this;
  }

 private:
  Severity sev_;
  bool emit_;
  std::ostringstream ss_;
};

// discard-stream for disabled logging; keeps `<<` chains compiling
class NullStream {
 public:
  template <typename T>
  NullStream& operator<<(const T&) {
    return *this;
  }
  NullStream& operator<<(std::ostream& (*)(std::ostream&)) { return *this; }
};

template <typename T>
T* CheckNotNull(T* p, const char* msg) {
  if (p == nullptr) {
    std::cerr << msg << std::endl;
    std::abort();
  }
  return p;
}

}  // namespace ref_oracle_log

#define LOG(severity) \
  ::ref_oracle_log::LogMessage(::ref_oracle_log::severity)
#define LOG_IF(severity, cond) \
  ::ref_oracle_log::LogMessage(::ref_oracle_log::severity, (cond))
#define LOG_EVERY_N(severity, n) \
  ::ref_oracle_log::LogMessage(::ref_oracle_log::severity, false)
#define LOG_FIRST_N(severity, n) \
  ::ref_oracle_log::LogMessage(::ref_oracle_log::severity, false)
#define DLOG(severity) ::ref_oracle_log::NullStream()
#define VLOG(n) ::ref_oracle_log::NullStream()

#define CHECK(cond)                                             \
  ::ref_oracle_log::LogMessage(::ref_oracle_log::FATAL, !(cond)) \
      << "Check failed: " #cond " "
#define CHECK_OP(a, b, op) CHECK((a)op(b)) << " (" << (a) << " vs " << (b) << ") "
#define CHECK_EQ(a, b) CHECK_OP(a, b, ==)
#define CHECK_NE(a, b) CHECK_OP(a, b, !=)
#define CHECK_LE(a, b) CHECK_OP(a, b, <=)
#define CHECK_LT(a, b) CHECK_OP(a, b, <)
#define CHECK_GE(a, b) CHECK_OP(a, b, >=)
#define CHECK_GT(a, b) CHECK_OP(a, b, >)
#define CHECK_NOTNULL(p) \
  ::ref_oracle_log::CheckNotNull((p), "Check failed: '" #p "' != NULL")

#define DCHECK(cond) ::ref_oracle_log::NullStream()
#define DCHECK_EQ(a, b) ::ref_oracle_log::NullStream()
#define DCHECK_NE(a, b) ::ref_oracle_log::NullStream()
#define DCHECK_LE(a, b) ::ref_oracle_log::NullStream()
#define DCHECK_LT(a, b) ::ref_oracle_log::NullStream()
#define DCHECK_GE(a, b) ::ref_oracle_log::NullStream()
#define DCHECK_GT(a, b) ::ref_oracle_log::NullStream()

#endif  // REF_ORACLE_GLOG_LOGGING_H_
