#ifndef MINI_VISUALIZATION_MSGS_MARKER_H
#define MINI_VISUALIZATION_MSGS_MARKER_H
#include <cstdint>
#include <string>
#include <std_msgs/Header.h>
#include <geometry_msgs/Pose.h>
namespace visualization_msgs {
struct Marker {
  enum Type { ARROW = 0, CUBE = 1, SPHERE = 2, CYLINDER = 3, LINE_STRIP = 4 };
  enum Action { ADD = 0, MODIFY = 0, DELETE = 2 };
  std_msgs::Header header;
  std::string ns;
  int32_t id = 0;
  int32_t type = 0;
  int32_t action = 0;
  geometry_msgs::Pose pose;
  struct { double x = 1, y = 1, z = 1; } scale;
  struct { float r = 0, g = 0, b = 0, a = 1; } color;
  ros::Duration lifetime;
};
}  // namespace visualization_msgs
#endif
