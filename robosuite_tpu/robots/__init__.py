from robosuite_tpu.robots.robot import FixedBaseRobot, RobotCtrlState  # noqa: F401
