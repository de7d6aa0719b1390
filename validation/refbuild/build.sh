#!/bin/bash
# Build the upstream SolveDVO (offline XML-replay mode) against the mini-ROS
# stubs. Reference sources are compiled FROM /root/reference read-only; no
# upstream code is copied into this repository.
#
# Usage: ./build.sh <xml_frame_dir> <start> <end> [skip] [outdir]
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
XMLDIR=${1:?xml frame dir}
START=${2:?start}
END=${3:?end}
SKIP=${4:-1}
OUT=${5:-/tmp/refbuild}
EIGEN=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)

mkdir -p "$OUT"
# NDEBUG=1 emulates a release build: Eigen/libc assertions off, so the
# upstream boundary bug (SolveDVO.cpp:371 admits u==nCols, truncated to an
# out-of-bounds index at :376-377/:446) silently reads out of bounds instead
# of aborting — the behavior real users of a release catkin build get.
g++ -O2 -std=gnu++14 -w ${NDEBUG:+-DNDEBUG} \
  -I"$HERE/stubs" -I"$EIGEN" -I"$REF/include" -I/usr/include/opencv4 \
  -include cassert \
  -include "$HERE/stubs/mini_eigen_float_index.h" \
  -DCV_DIST_L2=2 -DCV_DIST_MASK_PRECISE=0 \
  "-D__DATA_FROM_XML_FILES__=\"$XMLDIR\"" \
  -D__DATA_FROM_XML_FILES__START=$START \
  -D__DATA_FROM_XML_FILES__END=$END \
  -D__DATA_SKIP_FACTOR=$SKIP \
  "$REF/src/SolveDVO.cpp" "$REF/src/GOP.cpp" "$REF/src/FColorMap.cpp" \
  "$REF/src/MentisVisualHandle.cpp" \
  "$HERE/main_ref_dvo.cpp" "$HERE/noop_highgui.cpp" \
  -o "$OUT/ref_dvo" \
  -lopencv_core -lopencv_imgproc \
  -lpthread
echo "built: $OUT/ref_dvo"
