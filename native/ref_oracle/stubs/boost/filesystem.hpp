// boost::filesystem surface for caffe's io.hpp MakeTempDir/MakeTempFilename
// helpers, mapped onto std::filesystem + a counter-based unique_path.
#ifndef REF_ORACLE_BOOST_FILESYSTEM_HPP_
#define REF_ORACLE_BOOST_FILESYSTEM_HPP_
#include <atomic>
#include <filesystem>
#include <string>

namespace boost {
namespace filesystem {

using path = std::filesystem::path;

inline path temp_directory_path() { return std::filesystem::temp_directory_path(); }

inline path unique_path(const path& model) {
  static std::atomic<unsigned> ctr{0};
  std::string s = model.string();
  unsigned v = ctr.fetch_add(1) ^ static_cast<unsigned>(::getpid() << 8);
  for (auto& c : s) {
    if (c == '%') {
      c = "0123456789abcdef"[v & 0xf];
      v = v * 1103515245u + 12345u;
    }
  }
  return path(s);
}

inline bool create_directory(const path& p) {
  return std::filesystem::create_directory(p);
}

// rtpose.cpp surface
using std::filesystem::directory_iterator;
inline bool is_directory(const path& p) {
  return std::filesystem::is_directory(p);
}
inline bool is_directory(const std::filesystem::file_status& s) {
  return std::filesystem::is_directory(s);
}
inline bool exists(const path& p) { return std::filesystem::exists(p); }

}  // namespace filesystem
}  // namespace boost
#endif
