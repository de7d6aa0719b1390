// Mini stub of the catkin-generated header for msg/RGBDFrame.msg:
//   sensor_msgs/Image frame, dframe / float32 age / string name
#ifndef MINI_RGBD_ODOMETRY_RGBDFRAME_H
#define MINI_RGBD_ODOMETRY_RGBDFRAME_H
#include <memory>
#include <string>
#include <std_msgs/Header.h>
#include <sensor_msgs/Image.h>
namespace rgbd_odometry {
struct RGBDFrame {
  std_msgs::Header header;
  sensor_msgs::Image frame, dframe;
  float age = 0;
  std::string name;
};
typedef std::shared_ptr<RGBDFrame> RGBDFramePtr;
typedef std::shared_ptr<const RGBDFrame> RGBDFrameConstPtr;
}  // namespace rgbd_odometry
#endif
