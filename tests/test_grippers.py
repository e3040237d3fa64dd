"""Gripper harness tests (reference tests/test_grippers/* via
gripper_tester.py): the Panda gripper must grasp and lift a box."""

import numpy as np
import pytest


def test_panda_gripper_grasps_and_lifts():
    from robosuite_tpu.models.grippers.gripper_tester import GripperTester

    t = GripperTester("PandaGripper")
    out = t.run()
    assert out["finite"]
    assert out["lifted"], out


@pytest.mark.parametrize(
    "name",
    ["RethinkGripper", "JacoThreeFingerDexterousGripper", "RobotiqThreeFingerDexterousGripper"],
)
def test_other_grippers_stable(name):
    """Other grippers at least run the harness stably (grasp success depends
    on finger geometry fidelity; tracked per-gripper)."""
    from robosuite_tpu.models.grippers.gripper_tester import GripperTester

    t = GripperTester(name)
    out = t.run(n_steps_per_phase=75)
    assert out["finite"], out
