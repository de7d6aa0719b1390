// Mini stub of the catkin-generated message header for msg/RGBDFramePyd.msg:
//   string name / float32 age / sensor_msgs/Image[] framergb, framemono, dframe
#ifndef MINI_RGBD_ODOMETRY_RGBDFRAMEPYD_H
#define MINI_RGBD_ODOMETRY_RGBDFRAMEPYD_H
#include <memory>
#include <string>
#include <vector>
#include <std_msgs/Header.h>
#include <sensor_msgs/Image.h>
namespace rgbd_odometry {
struct RGBDFramePyd {
  std_msgs::Header header;
  std::string name;
  float age = 0;
  std::vector<sensor_msgs::Image> framergb, framemono, dframe;
};
typedef std::shared_ptr<RGBDFramePyd> RGBDFramePydPtr;
typedef std::shared_ptr<const RGBDFramePyd> RGBDFramePydConstPtr;
}  // namespace rgbd_odometry
#endif
