"""Drive a gripper through a lower/close/lift cycle against a free box in a
stand-alone mini world (reference demos/demo_gripper_interaction.py, which
builds the same world from MJCF parts via gripper_tester).

Usage: python -m robosuite_tpu.demos.demo_gripper_interaction [gripper]
"""

import sys

from robosuite_tpu.models.grippers.gripper_tester import GripperTester


def main():
    gripper = sys.argv[1] if len(sys.argv) > 1 else "PandaGripper"
    t = GripperTester(gripper)
    out = t.run()
    print(f"{gripper}: box z {out['z_before_lift']:.4f} -> {out['z_after_lift']:.4f} "
          f"lifted={out['lifted']} stable={out['finite']}")


if __name__ == "__main__":
    main()
