// Minimal ROS API stub — NOT ROS. Written from scratch for rgbd_odometry_tpu's
// reference-validation harness: just enough surface to compile and run the
// upstream SolveDVO offline (__DATA_FROM_XML_FILES__ mode), where every
// publisher is a no-op and the only transport is the XML frame loader.
#ifndef MINI_ROS_ROS_H
#define MINI_ROS_ROS_H

#include <chrono>
#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <iostream>
#include <sstream>
#include <string>
#include <thread>

namespace ros {

struct Duration {
  double sec;
  explicit Duration(double s = 0.0) : sec(s) {}
  double toSec() const { return sec; }
};

struct Time {
  double sec;
  explicit Time(double s = 0.0) : sec(s) {}
  static Time now() {
    using namespace std::chrono;
    return Time(duration<double>(steady_clock::now().time_since_epoch()).count());
  }
  double toSec() const { return sec; }
  Duration operator-(const Time &o) const { return Duration(sec - o.sec); }
};

struct Rate {
  double hz;
  explicit Rate(double h) : hz(h) {}
  void sleep() {}  // offline replay: no pacing
};

inline bool ok() { return true; }
inline void spinOnce() {}
inline void init(int, char **, const std::string &) {}

struct Subscriber {};

struct Publisher {
  template <class M>
  void publish(const M &) const {}
  uint32_t getNumSubscribers() const { return 0; }
};

struct NodeHandle {
  template <class Topic, class F, class T>
  Subscriber subscribe(const Topic &, uint32_t, F, T *) {
    return Subscriber();
  }
  template <class M, class Topic>
  Publisher advertise(const Topic &, uint32_t) {
    return Publisher();
  }
  template <class M, class Topic>
  Publisher advertise(const Topic &, uint32_t, bool /*latch*/) {
    return Publisher();
  }
};

namespace console {
namespace levels {
enum Level { Debug, Info, Warn, Error, Fatal };
}
// real ROS maps console levels to log4cxx levels here; the mini log4cxx
// Logger::setLevel(int) ignores the value, so plain ints suffice.
static const int g_level_lookup[] = {0, 1, 2, 3, 4};
inline bool set_logger_level(const std::string &, levels::Level) { return true; }
inline void notifyLoggerLevelsChanged() {}
}  // namespace console

}  // namespace ros

#ifndef ROSCONSOLE_DEFAULT_NAME
#define ROSCONSOLE_DEFAULT_NAME "mini_ros"
#endif

// printf-style logging to stderr (quiet for DEBUG)
#define MINI_ROS_LOGF(tag, ...)                    \
  do {                                             \
    std::fprintf(stderr, "[%s] ", tag);            \
    std::fprintf(stderr, __VA_ARGS__);             \
    std::fprintf(stderr, "\n");                    \
  } while (0)

#define ROS_INFO(...) MINI_ROS_LOGF("INFO", __VA_ARGS__)
#define ROS_WARN(...) MINI_ROS_LOGF("WARN", __VA_ARGS__)
#define ROS_ERROR(...) MINI_ROS_LOGF("ERROR", __VA_ARGS__)
#define ROS_DEBUG(...) \
  do {                 \
  } while (0)
#define ROS_INFO_ONCE(...)                 \
  do {                                     \
    static bool _once = false;             \
    if (!_once) {                          \
      _once = true;                        \
      MINI_ROS_LOGF("INFO", __VA_ARGS__);  \
    }                                      \
  } while (0)

#define MINI_ROS_LOGS(tag, expr)                              \
  do {                                                        \
    std::ostringstream _oss;                                  \
    _oss << expr;                                             \
    std::fprintf(stderr, "[%s] %s\n", tag, _oss.str().c_str()); \
  } while (0)

#define ROS_INFO_STREAM(expr) MINI_ROS_LOGS("INFO", expr)
// offline replay: throttled chatter is noise — drop it entirely
#define ROS_INFO_THROTTLE(period, ...) \
  do {                                 \
  } while (0)
#define ROS_INFO_STREAM_THROTTLE(period, expr) \
  do {                                         \
  } while (0)
#define ROS_ERROR_STREAM(expr) MINI_ROS_LOGS("ERROR", expr)
#define ROS_DEBUG_STREAM(expr) \
  do {                         \
  } while (0)
#define ROS_INFO_STREAM_ONCE(expr)      \
  do {                                  \
    static bool _once = false;          \
    if (!_once) {                       \
      _once = true;                     \
      MINI_ROS_LOGS("INFO", expr);      \
    }                                   \
  } while (0)

// The upstream printPose does `if (stream != std::cout)` — valid C++98 (via
// operator void*) but ill-formed since C++11. OpenCV 4 requires C++11+, so
// give ostreams an identity-based inequality instead of downgrading -std.
inline bool operator!=(const std::ostream &a, const std::ostream &b) {
  return &a != &b;
}

#endif  // MINI_ROS_ROS_H
