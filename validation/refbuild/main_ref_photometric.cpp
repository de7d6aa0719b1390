// Harness main for the upstream RGBDOdometry (legacy dense photometric GN):
// loads a ref/now RGB-D pair from PNGs, drives the unmodified upstream
// pipeline exactly as its eventLoop does (setRefFrame ->
// computeJacobianAllLevels -> setNowFrame -> GN at level 3 then 2,
// RGBDOdometry.cpp:158-164), and prints the final 4x4 transform.
//
// Access note: headers first, then `private` remapped for the upstream
// header only (see main_ref_imu.cpp).
//
// Usage: ref_photometric <calib.xml> <ref_rgb.png> <ref_depth16.png>
//                        <now_rgb.png> <now_depth16.png>
#include <ros/ros.h>
#include <log4cxx/logger.h>
#include <Eigen/Dense>
#include <Eigen/Geometry>
#include <opencv2/opencv.hpp>
#include <opencv2/core/eigen.hpp>
#include <cv_bridge/cv_bridge.h>
#include <rgbd_odometry/RGBDFrame.h>
#include <nav_msgs/Odometry.h>
#include <nav_msgs/Path.h>
#include <geometry_msgs/PoseStamped.h>
#include <sensor_msgs/Image.h>
#include <image_transport/image_transport.h>
#include <cstdio>

#define private public
#include <RGBDOdometry.h>
#undef private

int main(int argc, char **argv) {
  if (argc != 6) {
    std::fprintf(stderr,
                 "usage: %s calib.xml ref_rgb.png ref_depth16.png now_rgb.png "
                 "now_depth16.png\n",
                 argv[0]);
    return 2;
  }
  RGBDOdometry odo;  // ctor warns about missing params.xml
  odo.setCameraMatrix(argv[1]);
  if (!odo.cameraIntrinsicsReady) {
    std::fprintf(stderr, "calib load failed: %s\n", argv[1]);
    return 2;
  }

  cv::Mat ref_rgb = cv::imread(argv[2], cv::IMREAD_COLOR);
  cv::Mat ref_depth = cv::imread(argv[3], cv::IMREAD_UNCHANGED);
  cv::Mat now_rgb = cv::imread(argv[4], cv::IMREAD_COLOR);
  cv::Mat now_depth = cv::imread(argv[5], cv::IMREAD_UNCHANGED);
  if (ref_rgb.empty() || ref_depth.empty() || now_rgb.empty() ||
      now_depth.empty() || ref_depth.type() != CV_16UC1) {
    std::fprintf(stderr, "frame load failed (depth must be 16-bit PNG)\n");
    return 2;
  }

  odo.isFrameAvailable = true;  // setRefFrame/setNowFrame assert on this flag
  odo.setRefFrame(ref_rgb, ref_depth);
  odo.computeJacobianAllLevels();
  odo.setNowFrame(now_rgb, now_depth);

  // eventLoop's per-frame solve: identity start, level 3 then level 2
  TransformRep T =
      Eigen::AngleAxisd(0.0, Eigen::Vector3d(1., 0., 0.)) *
      Eigen::Translation3d(0., 0., 0.);
  odo.gaussNewtonIterations(3, T);
  odo.gaussNewtonIterations(2, T);

  const Eigen::Matrix4d M = T.matrix();
  for (int r = 0; r < 4; r++)
    for (int c = 0; c < 4; c++)
      std::printf("%.17e%s", M(r, c), (r == 3 && c == 3) ? "\n" : " ");
  return 0;
}
