// Headless no-op replacements for the few OpenCV highgui entry points the
// upstream code calls unconditionally. The harness deliberately does NOT
// link libopencv_highgui, so these definitions satisfy the linker and keep
// the offline replay display-free.
#include <opencv2/core/core.hpp>

namespace cv {
void imshow(const String &, InputArray) {}
int waitKey(int) { return -1; }
void namedWindow(const String &, int) {}
void destroyAllWindows() {}
void destroyWindow(const String &) {}
}  // namespace cv
