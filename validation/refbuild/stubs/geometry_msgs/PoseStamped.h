#ifndef MINI_GEOMETRY_MSGS_POSESTAMPED_H
#define MINI_GEOMETRY_MSGS_POSESTAMPED_H
#include <std_msgs/Header.h>
#include <geometry_msgs/Pose.h>
namespace geometry_msgs {
struct PoseStamped {
  std_msgs::Header header;
  Pose pose;
};
}  // namespace geometry_msgs
#endif
