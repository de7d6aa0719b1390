#ifndef MINI_SENSOR_MSGS_POINTCLOUD_H
#define MINI_SENSOR_MSGS_POINTCLOUD_H
#include <string>
#include <vector>
#include <std_msgs/Header.h>
namespace geometry_msgs {
struct Point32 { float x = 0, y = 0, z = 0; };
}
namespace sensor_msgs {
struct ChannelFloat32 {
  std::string name;
  std::vector<float> values;
};
struct PointCloud {
  std_msgs::Header header;
  std::vector<geometry_msgs::Point32> points;
  std::vector<ChannelFloat32> channels;
};
}  // namespace sensor_msgs
#endif
