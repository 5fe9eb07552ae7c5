// Display-warp shim linking the SYSTEM OpenCV: the exact warpAffine call
// of the reference producer (rtpose.cpp:331-338 — scale-diagonal affine,
// CV_INTER_CUBIC, black constant border).
//
// Why it exists: bicubic warp pixels are OpenCV-version-dependent (4.6 vs
// 5.0 differ by up to 8/255 on most pixels), so byte-level parity with an
// rtpose.bin built on this machine requires resampling through the same
// library the reference links — the distro OpenCV — not the python wheel.
// Opt-in via CRT_NATIVE_WARP=1 (pose/preprocess.py); the executed-reference
// image->JSON parity suite (tests/test_ref_image_e2e.py) turns it on.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 cvwarp.cpp -o libcvwarp.so \
//          -I/usr/include/opencv4 -lopencv_core -lopencv_imgproc
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

extern "C" int crt_warp_display(const unsigned char* src, int sh, int sw,
                                double scale, unsigned char* dst, int dh,
                                int dw) {
  try {
    cv::Mat s(sh, sw, CV_8UC3, const_cast<unsigned char*>(src));
    cv::Mat d(dh, dw, CV_8UC3, dst);
    cv::Mat M = cv::Mat::eye(2, 3, CV_64F);
    M.at<double>(0, 0) = scale;
    M.at<double>(1, 1) = scale;
    cv::warpAffine(s, d, M, cv::Size(dw, dh), cv::INTER_CUBIC,
                   cv::BORDER_CONSTANT, cv::Scalar(0, 0, 0));
    return 0;
  } catch (...) {
    return 1;
  }
}
