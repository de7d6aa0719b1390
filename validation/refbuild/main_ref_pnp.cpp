// Harness main for the upstream SolvePnP::PnP Gauss-Newton solver: reads a
// correspondence problem from stdin and runs the unmodified upstream solver,
// printing every stored iterate (R, T) — iteration-level cross-validation
// against rgbd_odometry_tpu.solvers.pnp.gn_pnp.
//
// stdin format:
//   fx fy cx cy
//   N
//   N lines: X Y Z u v        (world point, pixel point)
//   12 numbers: initial R row-major (9) then T (3)
//
// Access note: headers first, then `private` remapped for the upstream
// header only (see main_ref_imu.cpp).
#include <ros/ros.h>
#include <Eigen/Dense>
#include <Eigen/Geometry>
#include <opencv2/opencv.hpp>
#include <opencv2/core/eigen.hpp>
#include <cv_bridge/cv_bridge.h>
#include <rgbd_odometry/RGBDFrame.h>
#include <visualization_msgs/MarkerArray.h>
#include <visualization_msgs/Marker.h>
#include <geometry_msgs/PoseArray.h>
#include <geometry_msgs/Pose.h>
#include <geometry_msgs/PoseStamped.h>
#include <nav_msgs/Path.h>
#include <sensor_msgs/Image.h>
#include <image_transport/image_transport.h>
#include <cstdio>

#define private public
#include <SolvePnP.h>
#undef private

int main() {
  SolvePnP pnp;  // ctor warns about missing params.xml; intrinsics set below

  double fx, fy, cx, cy;
  if (std::scanf("%lf %lf %lf %lf", &fx, &fy, &cx, &cy) != 4) return 2;
  pnp.fx = fx;
  pnp.fy = fy;
  pnp.cx = cx;
  pnp.cy = cy;
  pnp.K = Eigen::Matrix3d::Zero();
  pnp.K(0, 0) = fx;
  pnp.K(1, 1) = fy;
  pnp.K(0, 2) = cx;
  pnp.K(1, 2) = cy;
  pnp.K(2, 2) = 1.0;
  pnp.cameraMatrix = (cv::Mat_<double>(3, 3) << fx, 0, cx, 0, fy, cy, 0, 0, 1);
  pnp.cameraIntrinsicsReady = true;

  int n = 0;
  if (std::scanf("%d", &n) != 1 || n <= 0) return 2;
  Eigen::MatrixXd objPts(n, 3), imPts(n, 2);
  for (int i = 0; i < n; i++) {
    double X, Y, Z, u, v;
    if (std::scanf("%lf %lf %lf %lf %lf", &X, &Y, &Z, &u, &v) != 5) return 2;
    objPts(i, 0) = X;
    objPts(i, 1) = Y;
    objPts(i, 2) = Z;
    imPts(i, 0) = u;
    imPts(i, 1) = v;
  }
  Eigen::Matrix3d R;
  Eigen::Vector3d T;
  for (int r = 0; r < 3; r++)
    for (int c = 0; c < 3; c++)
      if (std::scanf("%lf", &R(r, c)) != 1) return 2;
  for (int r = 0; r < 3; r++)
    if (std::scanf("%lf", &T(r)) != 1) return 2;

  pnp.PnP(objPts, imPts, R, T);

  // stored_R/stored_T hold the initial pose, each pre-iteration pose, and the
  // final pose — print them all (R row-major, then T) for per-iteration diff.
  for (size_t k = 0; k < pnp.stored_R.size(); k++) {
    const Eigen::Matrix3d &sR = pnp.stored_R[k];
    const Eigen::Vector3d &sT = pnp.stored_T[k];
    std::printf("%zu", k);
    for (int r = 0; r < 3; r++)
      for (int c = 0; c < 3; c++) std::printf(" %.17e", sR(r, c));
    for (int r = 0; r < 3; r++) std::printf(" %.17e", sT(r));
    std::printf("\n");
  }
  return 0;
}
