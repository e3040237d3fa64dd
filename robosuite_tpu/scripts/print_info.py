"""Print framework info (reference scripts/print_robosuite_info.py).

Usage: python -m robosuite_tpu.scripts.print_info
"""

import robosuite_tpu


def main():
    print(f"robosuite_tpu {robosuite_tpu.__version__}")
    print(f"environments ({len(list(robosuite_tpu.ALL_ENVIRONMENTS))}):", ", ".join(robosuite_tpu.ALL_ENVIRONMENTS))
    from robosuite_tpu.models.robots import REGISTERED_ROBOTS
    from robosuite_tpu.models.grippers import REGISTERED_GRIPPERS
    from robosuite_tpu.models.bases import REGISTERED_BASES
    from robosuite_tpu.controllers.factory import ALL_PART_CONTROLLERS

    print(f"robots ({len(REGISTERED_ROBOTS)}):", ", ".join(sorted(REGISTERED_ROBOTS)))
    print(f"grippers ({len(REGISTERED_GRIPPERS)}):", ", ".join(sorted(REGISTERED_GRIPPERS)))
    print(f"bases ({len(REGISTERED_BASES)}):", ", ".join(sorted(REGISTERED_BASES)))
    print(f"controllers ({len(ALL_PART_CONTROLLERS)}):", ", ".join(sorted(ALL_PART_CONTROLLERS)))
    import jax

    print("jax devices:", jax.devices())


if __name__ == "__main__":
    main()
