// Harness main for the upstream ImuDeadReckon: feeds IMU samples from stdin
// ("ax ay az wx wy wz" per line) through the unmodified upstream callback +
// nominal-state update, printing the full nominal state after every sample.
//
// Access note: the upstream class keeps everything private behind its ROS
// event loop. All transitive headers are included FIRST, then `private` is
// remapped for the upstream header only — the class layout is unchanged
// (GCC lays members out in declaration order), and no upstream code is
// copied or modified.
//
// Usage: ref_imu <a_var> <a_bias> <g_var> <g_bias> < samples.txt
#include <ros/ros.h>
#include <sensor_msgs/Imu.h>
#include <geometry_msgs/PoseStamped.h>
#include <Eigen/Dense>
#include <Eigen/Geometry>
#include <cstdio>
#include <cstdlib>

#define private public
#include <ImuDeadReckon.h>
#undef private

int main(int argc, char **argv) {
  if (argc != 5) {
    std::fprintf(stderr, "usage: %s a_var a_bias g_var g_bias < samples\n", argv[0]);
    return 2;
  }
  ImuDeadReckon imu;
  imu.ImuSetIntrinsics(std::atof(argv[1]), std::atof(argv[2]),
                       std::atof(argv[3]), std::atof(argv[4]));

  sensor_msgs::Imu msg;
  double ax, ay, az, wx, wy, wz;
  while (std::scanf("%lf %lf %lf %lf %lf %lf", &ax, &ay, &az, &wx, &wy, &wz) == 6) {
    msg.linear_acceleration.x = ax;
    msg.linear_acceleration.y = ay;
    msg.linear_acceleration.z = az;
    msg.angular_velocity.x = wx;
    msg.angular_velocity.y = wy;
    msg.angular_velocity.z = wz;
    imu.imuDataRcvd(msg);
    imu.updateNominalStateWithCurrentMeasurements();
    // p(3) v(3) q(x y z w) — float32 state printed at full precision
    std::printf("%.9e %.9e %.9e %.9e %.9e %.9e %.9e %.9e %.9e %.9e\n",
                (double)imu.nsv_p(0), (double)imu.nsv_p(1), (double)imu.nsv_p(2),
                (double)imu.nsv_v(0), (double)imu.nsv_v(1), (double)imu.nsv_v(2),
                (double)imu.nsv_q.x(), (double)imu.nsv_q.y(),
                (double)imu.nsv_q.z(), (double)imu.nsv_q.w());
  }
  return 0;
}
