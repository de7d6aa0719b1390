// Mini log4cxx stub: RGBDOdometry's constructor sets a logger level and
// nothing else — accept and ignore.
#ifndef MINI_LOG4CXX_LOGGER_H
#define MINI_LOG4CXX_LOGGER_H
#include <memory>
#include <string>
namespace log4cxx {
class Logger;
typedef std::shared_ptr<Logger> LoggerPtr;
class Logger {
 public:
  static LoggerPtr getLogger(const std::string &) {
    return LoggerPtr(new Logger());
  }
  void setLevel(int) {}
};
}  // namespace log4cxx
#endif
