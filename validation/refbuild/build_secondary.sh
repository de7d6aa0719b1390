#!/bin/bash
# Build the upstream SECONDARY solvers (ImuDeadReckon, SolvePnP's GN-PnP,
# RGBDOdometry's dense photometric GN) against the mini-ROS stubs, each with
# a small harness main that drives the unmodified upstream code offline.
# Reference sources compile FROM /root/reference read-only; nothing is copied.
#
# Usage: ./build_secondary.sh [outdir] [targets]
#   targets: comma-separated subset of imu,pnp,photometric (default: all)
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${1:-/tmp/refbuild}
TARGETS=${2:-imu,pnp,photometric}
EIGEN=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)

mkdir -p "$OUT"
COMMON=(-O2 -std=gnu++14 -w
  -I"$HERE/stubs" -I"$EIGEN" -I"$REF/include" -I/usr/include/opencv4
  -include cassert
  -include "$HERE/stubs/mini_eigen_float_index.h"
  -DCV_BGR2GRAY=6)  # cv::COLOR_BGR2GRAY; OpenCV4 dropped the legacy name

case ",$TARGETS," in *,imu,*)
  g++ "${COMMON[@]}" \
    "$REF/src/ImuDeadReckon.cpp" "$HERE/main_ref_imu.cpp" \
    -o "$OUT/ref_imu"
  echo "built: $OUT/ref_imu"
esac

case ",$TARGETS," in *,pnp,*)
  g++ "${COMMON[@]}" \
    "$REF/src/SolvePnP.cpp" "$HERE/main_ref_pnp.cpp" "$HERE/noop_highgui.cpp" \
    -o "$OUT/ref_pnp" \
    -lopencv_core -lopencv_imgproc -lopencv_calib3d
  echo "built: $OUT/ref_pnp"
esac

case ",$TARGETS," in *,photometric,*)
  g++ "${COMMON[@]}" \
    "$REF/src/RGBDOdometry.cpp" "$HERE/main_ref_photometric.cpp" \
    "$HERE/noop_highgui.cpp" \
    -o "$OUT/ref_photometric" \
    -lopencv_core -lopencv_imgproc -lopencv_imgcodecs
  echo "built: $OUT/ref_photometric"
esac
