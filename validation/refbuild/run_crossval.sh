#!/bin/bash
# End-to-end executed cross-validation against the actual upstream binary:
#   1. generate a synthetic sequence + calib, dumped in the reference's own
#      framemono_NNNN.xml format (cli dump / io/xml_dump.py)
#   2. compile the upstream SolveDVO from /root/reference (read-only) against
#      the mini-ROS stubs and run it offline on those frames
#   3. run this framework's reference-parity mode on the SAME frames
#   4. compare trajectories (compare_crossval.py)
#
# Usage: ./run_crossval.sh [frames] [workdir]
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
FRAMES=${1:-40}
WORK=${2:-/tmp/crossval}
XML="$WORK/xml"

mkdir -p "$XML" "$WORK/run/poses"
python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
from rgbd_odometry_tpu.cli import main
main(['calib', '--write-freiburg', '$XML'])
main(['dump', '--frames', '$FRAMES', '--out-dir', '$XML'])
"
"$HERE/build.sh" "$XML" 0 $((FRAMES - 1)) 1 "$WORK"
(cd "$WORK/run" && "$WORK/ref_dvo" "$XML/Freiburg_ROS_default_320x240.xml" > ref.log 2>&1)
python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
from rgbd_odometry_tpu.cli import main
main(['dvo', '--source', 'xml:$XML', '--method', 'subgradient',
      '--iterations', '50,50,50,50', '--out', '$WORK/run/mine.txt'])
" > "$WORK/run/mine.log" 2>&1
python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
from rgbd_odometry_tpu.cli import main
main(['dvo', '--source', 'xml:$XML', '--method', 'gauss_newton',
      '--iterations', '18,6,4,3', '--out', '$WORK/run/mine_lm.txt'])
" > "$WORK/run/mine_lm.log" 2>&1
python "$HERE/compare_crossval.py" "$WORK/run/poses/estPoses.txt" "$WORK/run/mine.txt" | tee "$WORK/crossval.json"
python "$HERE/accuracy_vs_gt.py" "$WORK/run/poses/estPoses.txt" "$WORK/run/mine.txt" "$WORK/run/mine_lm.txt" "$FRAMES" | tee "$WORK/accuracy.json"
