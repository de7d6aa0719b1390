// Mini-ROS tf stub: no transform source exists offline, so every lookup
// throws; the upstream loop's catch path ("NO TF Message...") handles it.
#ifndef MINI_TF_TRANSFORM_LISTENER_H
#define MINI_TF_TRANSFORM_LISTENER_H
#include <stdexcept>
#include <string>
#include <ros/ros.h>
namespace tf {

class TransformException : public std::runtime_error {
 public:
  explicit TransformException(const std::string &m) : std::runtime_error(m) {}
};

struct Quaternion {
  double x = 0, y = 0, z = 0, w = 1;
  double getX() const { return x; }
  double getY() const { return y; }
  double getZ() const { return z; }
  double getW() const { return w; }
};

struct Vector3 {
  double x = 0, y = 0, z = 0;
  double getX() const { return x; }
  double getY() const { return y; }
  double getZ() const { return z; }
};

struct StampedTransform {
  Quaternion getRotation() const { return Quaternion(); }
  Vector3 getOrigin() const { return Vector3(); }
};

struct TransformListener {
  bool waitForTransform(const std::string &, const std::string &, const ros::Time &,
                        const ros::Duration &) {
    return false;
  }
  void lookupTransform(const std::string &, const std::string &, const ros::Time &,
                       StampedTransform &) {
    throw TransformException("mini-ros tf stub: no transform source offline");
  }
};

}  // namespace tf
#endif
