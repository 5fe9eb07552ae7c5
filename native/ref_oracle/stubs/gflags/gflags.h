// Minimal gflags surface (common.hpp includes it; the oracle parses no
// flags itself).
#ifndef GFLAGS_GFLAGS_H_
#define GFLAGS_GFLAGS_H_
#include <cstdint>
#include <string>

#define DEFINE_VAR(type, name, val) type FLAGS_##name = (val)
#define DECLARE_VAR(type, name) extern type FLAGS_##name
#define DEFINE_bool(name, val, txt) DEFINE_VAR(bool, name, val)
#define DEFINE_int32(name, val, txt) DEFINE_VAR(int, name, val)
#define DEFINE_int64(name, val, txt) DEFINE_VAR(long long, name, val)
#define DEFINE_double(name, val, txt) DEFINE_VAR(double, name, val)
#define DEFINE_string(name, val, txt) DEFINE_VAR(std::string, name, val)
#define DECLARE_bool(name) DECLARE_VAR(bool, name)
#define DECLARE_int32(name) DECLARE_VAR(int, name)
#define DECLARE_string(name) DECLARE_VAR(std::string, name)

namespace gflags {
inline void ParseCommandLineFlags(int*, char***, bool) {}
inline void SetUsageMessage(const std::string&) {}
}  // namespace gflags
namespace google {
using gflags::ParseCommandLineFlags;
using gflags::SetUsageMessage;
}  // namespace google
#endif
