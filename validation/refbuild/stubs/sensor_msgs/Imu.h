// Mini stub of sensor_msgs/Imu — just the fields ImuDeadReckon touches.
#ifndef MINI_SENSOR_MSGS_IMU_H
#define MINI_SENSOR_MSGS_IMU_H
#include <std_msgs/Header.h>
namespace sensor_msgs {
struct Imu {
  struct Vec3 { double x = 0, y = 0, z = 0; };
  struct Quat { double x = 0, y = 0, z = 0, w = 1; };
  std_msgs::Header header;
  Quat orientation;
  Vec3 angular_velocity;
  Vec3 linear_acceleration;
};
}  // namespace sensor_msgs
#endif
