#ifndef MINI_VISUALIZATION_MSGS_MARKERARRAY_H
#define MINI_VISUALIZATION_MSGS_MARKERARRAY_H
#include <vector>
#include <visualization_msgs/Marker.h>
namespace visualization_msgs {
struct MarkerArray {
  std::vector<Marker> markers;
};
}  // namespace visualization_msgs
#endif
