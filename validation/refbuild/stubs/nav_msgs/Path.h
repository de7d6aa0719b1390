#ifndef MINI_NAV_MSGS_PATH_H
#define MINI_NAV_MSGS_PATH_H
#include <vector>
#include <std_msgs/Header.h>
#include <geometry_msgs/PoseStamped.h>
namespace nav_msgs {
struct Path {
  std_msgs::Header header;
  std::vector<geometry_msgs::PoseStamped> poses;
};
}  // namespace nav_msgs
#endif
