/* Force-included when compiling the reference data_transformer.cpp against
 * OpenCV 4: pulls the modern module headers (OpenCV 2 let core.hpp leak
 * everything) and maps the removed C-API constant names the CPM code uses. */
#ifndef REF_ORACLE_OPENCV_LEGACY_H_
#define REF_ORACLE_OPENCV_LEGACY_H_

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc/types_c.h>

#ifndef CV_BGR2GRAY
#define CV_BGR2GRAY cv::COLOR_BGR2GRAY
#endif
#ifndef CV_GRAY2BGR
#define CV_GRAY2BGR cv::COLOR_GRAY2BGR
#endif
#ifndef CV_BGR2Lab
#define CV_BGR2Lab cv::COLOR_BGR2Lab
#endif
#ifndef CV_Lab2BGR
#define CV_Lab2BGR cv::COLOR_Lab2BGR
#endif
#ifndef CV_FILLED
#define CV_FILLED cv::FILLED
#endif
#ifndef CV_RGB
#define CV_RGB(r, g, b) cv::Scalar((b), (g), (r), 0)
#endif

#endif  // REF_ORACLE_OPENCV_LEGACY_H_
