"""Print the action-space layout of an env/robot/controller combination
(reference scripts/print_robot_action_info.py).

Usage: python -m robosuite_tpu.scripts.print_robot_action_info \
        [--environment Lift] [--robots Panda ...] [--controller BASIC]
"""

import argparse

import robosuite_tpu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--environment", type=str, default="Lift")
    parser.add_argument("--robots", nargs="+", type=str, default=["Panda"])
    parser.add_argument("--controller", type=str, default=None,
                        help="composite controller type (BASIC / WHOLE_BODY_IK) or json path")
    args = parser.parse_args()

    kwargs = {}
    if args.controller is not None:
        from robosuite_tpu.controllers.factory import load_composite_controller_config
        kwargs["controller_configs"] = load_composite_controller_config(
            controller=args.controller, robot=args.robots[0]
        )
    robots = args.robots if len(args.robots) > 1 else args.robots[0]
    env = robosuite_tpu.make(args.environment, robots=robots, **kwargs)

    print(f"env: {args.environment}  robots: {args.robots}")
    print(f"total action_dim: {env.action_dim}")
    for robot in env.robots:
        idx = robot.action_split_indexes()
        print(f"  {robot.rm.__class__.__name__}:")
        for part, (lo, hi) in idx.items():
            if hi > lo:
                print(f"    {part:20s} [{lo:3d}, {hi:3d})  dim {hi - lo}")


if __name__ == "__main__":
    main()
