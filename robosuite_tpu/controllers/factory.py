"""Controller factories + config resolution.

Re-derivation of reference controllers/parts/controller_factory.py:73-159 and
composite/composite_controller_factory.py:73-140: resolve a controller config
(name, dict, or None) into the per-arm config dataclasses consumed by the
runtime robot layer. Search order mirrors the reference: explicit dict >
named controller type > per-robot default > BASIC defaults.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from robosuite_tpu.controllers.parts import ik as ik_mod
from robosuite_tpu.controllers.parts import joint_pos as jp_mod
from robosuite_tpu.controllers.parts import joint_tor as jt_mod
from robosuite_tpu.controllers.parts import joint_vel as jv_mod
from robosuite_tpu.controllers.parts import osc as osc_mod

ALL_PART_CONTROLLERS = {
    "OSC_POSE",
    "OSC_POSITION",
    "JOINT_POSITION",
    "JOINT_VELOCITY",
    "JOINT_TORQUE",
    "IK_POSE",
}

# reference config/default/composite/basic.json arm defaults
_OSC_DEFAULTS = dict(
    input_max=1.0,
    input_min=-1.0,
    output_max=(0.05, 0.05, 0.05, 0.5, 0.5, 0.5),
    output_min=(-0.05, -0.05, -0.05, -0.5, -0.5, -0.5),
    kp=150.0,
    damping_ratio=1.0,
    impedance_mode="fixed",
    kp_limits=(0.0, 300.0),
    damping_ratio_limits=(0.0, 10.0),
    input_type="delta",
    input_ref_frame="base",
    uncouple_pos_ori=True,
)


def arm_controller_config(ctrl_type: str, dim: int = 7, **overrides):
    """Build a part-controller config dataclass (reference
    controller_factory.py:73-142 arm_controller_factory)."""
    t = ctrl_type.upper()
    if t == "OSC_POSE":
        kw = dict(_OSC_DEFAULTS)
        kw.update(overrides)
        kw.pop("control_ori", None)
        return osc_mod.OSCConfig(control_ori=True, **kw)
    if t == "OSC_POSITION":
        kw = dict(_OSC_DEFAULTS)
        kw["output_max"] = (0.05, 0.05, 0.05)
        kw["output_min"] = (-0.05, -0.05, -0.05)
        kw.update(overrides)
        kw.pop("control_ori", None)
        return osc_mod.OSCConfig(control_ori=False, **kw)
    if t == "JOINT_POSITION":
        kw = dict(dim=dim, input_max=1.0, input_min=-1.0, output_max=0.05, output_min=-0.05, kp=50.0)
        kw.update(overrides)
        return jp_mod.JointPosConfig(**kw)
    if t == "JOINT_VELOCITY":
        kw = dict(dim=dim, input_max=1.0, input_min=-1.0, output_max=1.0, output_min=-1.0, kp=0.25)
        kw.update(overrides)
        return jv_mod.JointVelConfig(**kw)
    if t == "IK_POSE":
        kw = dict(dim=dim)
        kw.update(overrides)
        return ik_mod.IKConfig(**kw)
    if t == "JOINT_TORQUE":
        kw = dict(dim=dim, input_max=1.0, input_min=-1.0, output_max=0.05, output_min=-0.05)
        kw.update(overrides)
        return jt_mod.JointTorConfig(**kw)
    raise ValueError(f"unknown controller type {ctrl_type!r}; known: {sorted(ALL_PART_CONTROLLERS)}")


def robot_config_name(robot: str) -> str:
    """Standardized per-robot config-file stem (reference
    composite_controller_factory.py:141-156 _get_robot_name): variant robot
    classes share one default file (GR1ArmsOnly -> gr1, PandaDexLH/RH ->
    panda_dex)."""
    if "GR1FloatingBody" in robot:
        return "gr1_floating_body"
    if "GR1FixedLowerBody" in robot:
        return "gr1_fixed_lower_body"
    if "GR1" in robot:
        return "gr1"
    if "PandaDex" in robot:
        return "panda_dex"
    if "SpotWithArm" in robot:
        return "spotwitharm"
    return robot.lower()


def resolve_controller_json(
    controller: Union[None, str, dict] = None, robot: Optional[str] = None
) -> Optional[dict]:
    """Reference search order (composite_controller_factory.py:89-113):
    explicit .json path > registered composite name (shipped default JSON
    in config/default/composite/) > per-robot default
    (config/robots/default_<name>.json) > None. Returns the raw config dict
    so callers see the composite `type` (WHOLE_BODY_IK / HYBRID_MOBILE_BASE)
    before the arm configs are flattened; part-controller names
    ("OSC_POSE", ...) pass through as None (handled downstream)."""
    import json
    import os

    cfg_root = os.path.join(os.path.dirname(__file__), "config")
    if isinstance(controller, dict):
        return controller
    if isinstance(controller, str) and controller.endswith(".json"):
        with open(controller) as f:
            return json.load(f)
    if isinstance(controller, str):
        path = os.path.join(cfg_root, "default", "composite",
                            controller.lower() + ".json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None  # part-controller type name — resolved downstream
    if controller is None and robot is not None:
        path = os.path.join(cfg_root, "robots",
                            f"default_{robot_config_name(robot)}.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
    return None


def load_composite_controller_config(
    controller: Union[None, str, dict] = None, robot: Optional[str] = None, arms=None
):
    """Resolve to {arm_name: config dataclass} (reference
    composite_controller_factory.py:73-140; BASIC composite only for now).

    Accepts:
      * None -> per-robot default (OSC_POSE with reference gains)
      * a part-controller type name ("OSC_POSE", "JOINT_POSITION", ...)
      * a dict {"type": "BASIC", "body_parts": {"arms": {"right": {...}}}}
        (the reference's JSON schema)
      * a dict {"right": <config dataclass or part dict>}
    """
    if arms is None:
        arms = ["right", "left"] if robot == "Baxter" else ["right"]
    arms = list(arms)

    resolved = resolve_controller_json(controller, robot=robot)
    if resolved is not None:
        controller = resolved

    if controller is None:
        return {arm: arm_controller_config("OSC_POSE") for arm in arms}
    if isinstance(controller, str):
        return {arm: arm_controller_config(controller) for arm in arms}
    if isinstance(controller, dict):
        if "body_parts" in controller:  # reference JSON schema
            out = {}
            for arm, cfg in controller["body_parts"].get("arms", {}).items():
                cfg = dict(cfg)
                t = cfg.pop("type")
                cfg.pop("gripper", None)
                if not t.upper().startswith("OSC"):
                    # goal interpolation is wired for the OSC family
                    # (utils/traj_utils.py analog lives in OSCConfig)
                    cfg.pop("interpolation", None)
                    cfg.pop("ramp_ratio", None)
                if cfg.get("interpolation", "linear") is None:
                    cfg.pop("interpolation", None)
                    cfg.pop("ramp_ratio", None)
                cfg.pop("position_limits", None)
                cfg.pop("orientation_limits", None)
                for k in ("output_max", "output_min", "kp_limits", "damping_ratio_limits"):
                    if k in cfg and isinstance(cfg[k], list):
                        cfg[k] = tuple(cfg[k])
                # drop reference-JSON keys with no analog in the config
                # dataclass (kd/kv/velocity_limits on JOINT_POSITION, ...)
                import dataclasses as _dc

                probe = arm_controller_config(t)
                fields = {f.name for f in _dc.fields(probe)}
                cfg = {k: v for k, v in cfg.items() if k in fields}
                out[arm] = arm_controller_config(t, **cfg)
            return out
        # {arm: config}
        out = {}
        for arm, cfg in controller.items():
            if isinstance(cfg, dict):
                t = cfg.pop("type")
                out[arm] = arm_controller_config(t, **cfg)
            else:
                out[arm] = cfg
        return out
    raise ValueError(f"cannot interpret controller config: {controller!r}")
