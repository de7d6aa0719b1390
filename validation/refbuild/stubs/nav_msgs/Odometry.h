#ifndef MINI_NAV_MSGS_ODOMETRY_H
#define MINI_NAV_MSGS_ODOMETRY_H
#include <std_msgs/Header.h>
#include <geometry_msgs/Pose.h>
namespace nav_msgs {
struct Odometry {
  std_msgs::Header header;
  std::string child_frame_id;
  struct PoseWithCovariance { geometry_msgs::Pose pose; } pose;
};
}  // namespace nav_msgs
#endif
