"""Canonical solver profiles (rgbd_odometry_tpu/profiles.py).

The VGA profile's accuracy/perf evidence lives on-chip
(validation/refbuild/VGA_SWEEP_r5.log: mean t_err better than
production_320 on all 18 family x magnitude combos); these tests pin the
structural invariants that make that evidence transferable: the VGA coarse
ladder IS the tuned 320 ladder, geometrically and knob-for-knob.
"""

import numpy as np

from rgbd_odometry_tpu.core.camera import Intrinsics
from rgbd_odometry_tpu.profiles import parity_320, production_320, production_vga


def test_parity_matches_reference_constants():
    p = parity_320()
    assert p.solver.method == "subgradient"
    assert p.solver.iterations == (50, 50, 50, 50)
    assert (p.camera.width, p.camera.height) == (320, 240)
    assert p.num_levels == 4


def test_vga_coarse_ladder_is_the_tuned_320_ladder():
    p320 = production_320()
    pvga = production_vga()
    assert pvga.num_levels == p320.num_levels + 1
    assert (pvga.camera.width, pvga.camera.height) == (640, 480)
    # VGA levels 1..4 have exactly the 320 profile's level 0..3 geometry
    i320 = Intrinsics.from_config(p320.camera)
    ivga = Intrinsics.from_config(pvga.camera)
    for l in range(p320.num_levels):
        a, b = i320.at_level(l), ivga.at_level(l + 1)
        np.testing.assert_allclose(
            [a.fx, a.fy, a.cx, a.cy], [b.fx, b.fy, b.cx, b.cy], rtol=1e-12
        )
    # same iteration schedule + capacities on the shared levels, one extra
    # refinement level on the full VGA frame
    assert pvga.solver.iterations[1:] == p320.solver.iterations
    assert pvga.max_points[1:] == p320.max_points
    # every non-schedule solver knob identical (the tuned A/B decisions
    # carry over: lm strides, edt window, selection, gather dtype, ...)
    import dataclasses

    s320 = dataclasses.asdict(p320.solver)
    svga = dataclasses.asdict(pvga.solver)
    s320.pop("iterations")
    svga.pop("iterations")
    assert s320 == svga
