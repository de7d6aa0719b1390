// Mini cv_bridge stub: only reachable from live-stream callbacks, which the
// offline XML replay never invokes — conversion therefore just throws.
#ifndef MINI_CV_BRIDGE_H
#define MINI_CV_BRIDGE_H
#include <memory>
#include <stdexcept>
#include <string>
#include <opencv2/core/core.hpp>
#include <sensor_msgs/Image.h>
namespace cv_bridge {

class Exception : public std::runtime_error {
 public:
  explicit Exception(const std::string &m) : std::runtime_error(m) {}
};

struct CvImage {
  cv::Mat image;
};
typedef std::shared_ptr<CvImage> CvImagePtr;

inline CvImagePtr toCvCopy(const sensor_msgs::Image &, const std::string & = "") {
  throw Exception("mini cv_bridge stub: live stream conversion unavailable offline");
}

// SolvePnP / RGBDOdometry live callbacks use the shared variant; the offline
// harnesses drive the solvers directly, so this is compile-only surface.
template <class TrackedPtr>
inline CvImagePtr toCvShare(const sensor_msgs::Image &, const TrackedPtr &,
                            const std::string & = "") {
  throw Exception("mini cv_bridge stub: live stream conversion unavailable offline");
}

}  // namespace cv_bridge
#endif
