// Harness main for the upstream SolveDVO in offline XML-replay mode.
// Usage: ref_dvo <calib.xml>   (frame dir/range fixed at build time via
// the __DATA_FROM_XML_FILES__* compile definitions, mirroring upstream).
#include <ros/ros.h>
#include <SolveDVO.h>

int main(int argc, char **argv) {
  Eigen::initParallel();
  ros::init(argc, argv, "gdvo_node");
  SolveDVO dvo;
  dvo.setCameraMatrix(argc > 1 ? argv[1] : "Freiburg_ROS_default_320x240.xml");
  dvo.loop();
  return 0;
}
