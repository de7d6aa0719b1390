// Mini-ROS stub: logging lives in ros/ros.h.
#ifndef MINI_ROS_CONSOLE_H
#define MINI_ROS_CONSOLE_H
#include <ros/ros.h>
#endif
