#ifndef MINI_IMAGE_TRANSPORT_H
#define MINI_IMAGE_TRANSPORT_H
#include <ros/ros.h>
#endif
