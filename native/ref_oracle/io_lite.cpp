// Replacement for the two io.cpp entry points the oracle needs.  The
// reference's io.cpp cannot compile against protobuf >= 3.11 (it calls the
// removed two-argument CodedInputStream::SetTotalBytesLimit) and drags in
// OpenCV C-API image IO, so the proto read helpers are re-provided here.
#include <fcntl.h>
#include <unistd.h>

#include <google/protobuf/io/coded_stream.h>
#include <google/protobuf/io/zero_copy_stream_impl.h>
#include <google/protobuf/text_format.h>

#include "caffe/util/io.hpp"

namespace caffe {

using google::protobuf::Message;
using google::protobuf::io::CodedInputStream;
using google::protobuf::io::FileInputStream;

bool ReadProtoFromTextFile(const char* filename, Message* proto) {
  int fd = open(filename, O_RDONLY);
  if (fd < 0) return false;
  FileInputStream input(fd);
  bool ok = google::protobuf::TextFormat::Parse(&input, proto);
  close(fd);
  return ok;
}

bool ReadProtoFromBinaryFile(const char* filename, Message* proto) {
  int fd = open(filename, O_RDONLY);
  if (fd < 0) return false;
  FileInputStream raw(fd);
  CodedInputStream coded(&raw);
  coded.SetTotalBytesLimit(INT_MAX);
  bool ok = proto->ParseFromCodedStream(&coded) && coded.ConsumedEntireMessage();
  close(fd);
  return ok;
}

void WriteProtoToBinaryFile(const Message& proto, const char* filename) {
  std::string out;
  proto.SerializeToString(&out);
  int fd = open(filename, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return;
  ssize_t n = write(fd, out.data(), out.size());
  (void)n;
  close(fd);
}

#ifdef REF_ORACLE_HAVE_OPENCV
// Datum image decode (io.cpp:183-202 behavior) — needed by the standard
// DataTransformer path; provided via cv::imdecode.
cv::Mat DecodeDatumToCVMatNative(const Datum& datum) {
  CHECK(datum.encoded()) << "Datum not encoded";
  const std::string& data = datum.data();
  std::vector<char> vec(data.begin(), data.end());
  return cv::imdecode(vec, -1 /* IMREAD_UNCHANGED */);
}

cv::Mat DecodeDatumToCVMat(const Datum& datum, bool is_color) {
  CHECK(datum.encoded()) << "Datum not encoded";
  const std::string& data = datum.data();
  std::vector<char> vec(data.begin(), data.end());
  return cv::imdecode(vec, is_color ? 1 : 0);
}
#endif

}  // namespace caffe
