"""Generate the shipped controller-config JSON library.

Emits robosuite_tpu/controllers/config/: the composite defaults
(default/composite/), the single-part defaults (default/parts/) and a tuned
per-robot default for EVERY registered robot (robots/default_<name>.json) —
the reference's search-order step 3 (composite_controller_factory.py:89-100)
so no robot silently falls back to generic gains.

Content parity: the gain/limit values reproduce the reference's shipped
library (/root/reference/robosuite/controllers/config/) as data; the files
are composed here from shared part templates instead of being copied.

Run: python tools/gen_controller_configs.py   (idempotent; overwrites)
"""

from __future__ import annotations

import copy
import json
import os

ROOT = os.path.join(os.path.dirname(__file__), "..",
                    "robosuite_tpu", "controllers", "config")


# ---------------------------------------------------------------------------
# part templates (reference config/default/parts/*.json)
# ---------------------------------------------------------------------------

def osc_pose(**over):
    d = {
        "type": "OSC_POSE",
        "input_max": 1, "input_min": -1,
        "output_max": [0.05, 0.05, 0.05, 0.5, 0.5, 0.5],
        "output_min": [-0.05, -0.05, -0.05, -0.5, -0.5, -0.5],
        "kp": 150, "damping_ratio": 1, "impedance_mode": "fixed",
        "kp_limits": [0, 300], "damping_ratio_limits": [0, 10],
        "position_limits": None, "orientation_limits": None,
        "uncouple_pos_ori": True,
        "input_type": "delta", "input_ref_frame": "base",
        "interpolation": None, "ramp_ratio": 0.2,
    }
    d.update(over)
    return d


def osc_position(**over):
    d = osc_pose(type="OSC_POSITION",
                 output_max=[0.05, 0.05, 0.05], output_min=[-0.05, -0.05, -0.05])
    for k in ("orientation_limits", "uncouple_pos_ori"):
        d.pop(k)
    d.update(over)
    return d


def joint_position(**over):
    """Arm-tracking JOINT_POSITION (the WBIK/teleop arm stack: absolute
    input, kp=1000 stiff tracking — reference default_gr1.json arms)."""
    d = {
        "type": "JOINT_POSITION",
        "input_max": 1, "input_min": -1, "input_type": "absolute",
        "output_max": 0.5, "output_min": -0.5,
        "kd": 200, "kv": 200, "kp": 1000,
        "velocity_limits": [-1, 1], "kp_limits": [0, 1000],
        "interpolation": None, "ramp_ratio": 0.2,
    }
    d.update(over)
    return d


def joint_position_default(**over):
    """Standalone JOINT_POSITION part default (delta input, kp=50 —
    reference default/parts/joint_position.json)."""
    d = {
        "type": "JOINT_POSITION",
        "input_max": 1, "input_min": -1,
        "output_max": 0.05, "output_min": -0.05,
        "kp": 50, "damping_ratio": 1, "impedance_mode": "fixed",
        "kp_limits": [0, 300], "damping_ratio_limits": [0, 10],
        "qpos_limits": None, "interpolation": None, "ramp_ratio": 0.2,
    }
    d.update(over)
    return d


def joint_velocity(**over):
    d = {
        "type": "JOINT_VELOCITY",
        "input_max": 1, "input_min": -1,
        "output_max": 0.5, "output_min": -0.5,
        "kp": 3.0, "velocity_limits": [-1, 1],
        "interpolation": None, "ramp_ratio": 0.2,
    }
    d.update(over)
    return d


def joint_torque(**over):
    d = {
        "type": "JOINT_TORQUE",
        "input_max": 1, "input_min": -1,
        "output_max": 0.1, "output_min": -0.1,
        "torque_limits": None, "interpolation": None, "ramp_ratio": 0.2,
    }
    d.update(over)
    return d


def ik_pose(**over):
    d = {
        "type": "IK_POSE",
        "ik_pos_limit": 0.02, "ik_ori_limit": 0.05,
        "interpolation": None, "ramp_ratio": 0.2,
    }
    d.update(over)
    return d


def base_vel():
    return {"type": "JOINT_VELOCITY", "interpolation": None}


def with_grip(arm, scaling=True):
    arm = copy.deepcopy(arm)
    arm["gripper"] = {"type": "GRIP"} if scaling else \
        {"type": "GRIP", "use_action_scaling": False}
    return arm


# ---------------------------------------------------------------------------
# composite compositions
# ---------------------------------------------------------------------------

def basic(arms=("right",), scaling=True, extra_parts=None):
    cfg = {"type": "BASIC",
           "body_parts": {"arms": {a: with_grip(osc_pose(), scaling) for a in arms}}}
    if extra_parts:
        cfg["body_parts"].update(copy.deepcopy(extra_parts))
    return cfg


MOBILE_PARTS = {
    "torso": joint_position(),
    "head": joint_position(),
    "base": base_vel(),
}

# GR1 whole-body-IK solver settings (reference default_gr1.json
# composite_controller_specific_configs)
GR1_WBIK_SPECIFIC = {
    "ref_name": ["gripper0_right_grip_site", "gripper0_left_grip_site"],
    "interpolation": None,
    "actuation_part_names": ["torso", "head", "right", "left", "base", "legs"],
    "max_dq": 4,
    "nullspace_joint_weights": {
        "robot0_torso_waist_yaw": 100.0,
        "robot0_torso_waist_pitch": 100.0,
        "robot0_torso_waist_roll": 500.0,
        "robot0_l_shoulder_pitch": 4.0,
        "robot0_r_shoulder_pitch": 4.0,
        "robot0_l_shoulder_roll": 3.0,
        "robot0_r_shoulder_roll": 3.0,
        "robot0_l_shoulder_yaw": 2.0,
        "robot0_r_shoulder_yaw": 2.0,
    },
    "ik_pseudo_inverse_damping": 0.05,
    "ik_integration_dt": 0.1,
    "ik_max_dq": 4.0,
    "ik_max_dq_torso": 0.2,
    "ik_input_type": "absolute",
    "ik_input_ref_frame": "base",
    "ik_input_rotation_repr": "axis_angle",
    "verbose": False,
}


def wbik_body_parts(arms=("right", "left"), parts=("torso", "head", "base"),
                    legs=False, scaling=True):
    bp = {"arms": {a: with_grip(joint_position(), scaling) for a in arms}}
    for p in parts:
        bp[p] = joint_position() if p != "base" else base_vel()
    if legs:
        leg = joint_position()
        leg.pop("input_type")  # reference legs entry uses delta input
        bp["legs"] = leg
    return bp


def gr1_wbik():
    return {
        "type": "WHOLE_BODY_IK",
        "composite_controller_specific_configs": copy.deepcopy(GR1_WBIK_SPECIFIC),
        "body_parts": wbik_body_parts(parts=("torso", "head", "base"),
                                      legs=True, scaling=False),
    }


def gr1_mink():
    sc = {
        "ref_name": ["gripper0_right_grip_site", "gripper0_left_grip_site"],
        "interpolation": None,
        "actuation_part_names": ["torso", "head", "right", "left"],
        "max_dq": 4,
        "ik_pseudo_inverse_damping": 0.05,
        "ik_integration_dt": 0.1,
        "ik_input_type": "absolute",
        "ik_input_ref_frame": "base",
        "ik_input_rotation_repr": "axis_angle",
        "verbose": False,
        "ik_posture_weights": {
            "robot0_torso_waist_yaw": 10.0,
            "robot0_torso_waist_pitch": 10.0,
            "robot0_torso_waist_roll": 200.0,
            "robot0_l_shoulder_pitch": 4.0,
            "robot0_r_shoulder_pitch": 4.0,
            "robot0_l_shoulder_roll": 3.0,
            "robot0_r_shoulder_roll": 3.0,
            "robot0_l_shoulder_yaw": 2.0,
            "robot0_r_shoulder_yaw": 2.0,
        },
        "ik_hand_pos_cost": 1.0,
        "ik_hand_ori_cost": 0.5,
        "use_joint_angle_action_input": False,
    }
    return {
        "type": "WHOLE_BODY_MINK_IK",
        "composite_controller_specific_configs": sc,
        "body_parts": wbik_body_parts(parts=("torso", "head"), scaling=False),
    }


def gr1_floating():
    bp = {"arms": {a: with_grip(osc_pose(), scaling=False)
                   for a in ("right", "left")}}
    bp["torso"] = {"type": "JOINT_POSITION", "interpolation": None}
    bp["head"] = {"type": "JOINT_POSITION", "interpolation": None}
    bp["base"] = base_vel()
    return {"type": "HYBRID_MOBILE_BASE", "body_parts": bp}


def pandaomron():
    return {
        "type": "HYBRID_MOBILE_BASE",
        "body_parts": {
            "arms": {"right": with_grip(osc_pose())},
            "torso": {"type": "JOINT_POSITION", "interpolation": None, "kp": 2000},
            "base": base_vel(),
        },
    }


def pandaomron_wbik():
    sc = copy.deepcopy(GR1_WBIK_SPECIFIC)
    sc["actuation_part_names"] = ["right", "left"]
    sc["ik_input_ref_frame"] = "mobilebase0_base"
    return {
        "type": "WHOLE_BODY_IK",
        "composite_controller_specific_configs": sc,
        "body_parts": wbik_body_parts(parts=("torso", "head", "base"), legs=True),
    }


def tiago():
    sc = {
        "ref_name": ["gripper0_right_grip_site", "gripper0_left_grip_site"],
        "interpolation": None,
        "max_dq": 4,
        "nullspace_joint_weights": {"robot0_torso_lift_joint": 100.0},
        "ik_pseudo_inverse_damping": 0.05,
        "ik_integration_dt": 0.1,
        "ik_max_dq": 4.0,
        "ik_max_dq_torso": 0.2,
        "ik_input_type": "absolute",
        "ik_input_ref_frame": "base",
        "ik_input_rotation_repr": "axis_angle",
        "verbose": False,
    }
    return {
        "type": "BASIC",
        "composite_controller_specific_configs": sc,
        "body_parts": {
            "arms": {a: with_grip(osc_pose()) for a in ("right", "left")},
            "torso": joint_position(),
            "head": joint_position(),
            "base": base_vel(),
        },
    }


def tiago_wbik():
    sc = {
        "ref_name": ["gripper0_right_grip_site", "gripper0_left_grip_site"],
        "interpolation": None,
        "actuation_part_names": ["torso", "head", "right", "left"],
        "max_dq": 4,
        "nullspace_joint_weights": {"robot0_torso_lift_joint": 100.0},
        "ik_pseudo_inverse_damping": 0.05,
        "ik_integration_dt": 0.1,
        "ik_max_dq": 4.0,
        "ik_max_dq_torso": 0.2,
        "ik_input_rotation_repr": "axis_angle",
        "verbose": False,
    }
    return {
        "type": "WHOLE_BODY_IK",
        "composite_controller_specific_configs": sc,
        "body_parts": wbik_body_parts(parts=("torso", "head", "base")),
    }


def spotwitharm():
    legs = joint_position()
    legs.pop("input_type")
    return basic(extra_parts={"legs": legs})


FILES = {
    # composite defaults (reference config/default/composite/)
    "default/composite/basic.json": basic(arms=("right", "left")),
    "default/composite/hybrid_mobile_base.json": {
        "type": "HYBRID_MOBILE_BASE",
        "body_parts": {
            "arms": {a: with_grip(osc_pose()) for a in ("right", "left")},
            "torso": joint_position(),
            "head": joint_position(),
            "base": base_vel(),
            "legs": (lambda d: (d.pop("input_type"), d)[1])(joint_position()),
        },
    },
    "default/composite/whole_body_ik.json": {
        "type": "WHOLE_BODY_IK",
        "composite_controller_specific_configs": copy.deepcopy(GR1_WBIK_SPECIFIC),
        "body_parts": wbik_body_parts(parts=("torso", "head", "base"), legs=True),
    },
    "default/composite/whole_body_mink_ik.json": gr1_mink(),
    # single-part defaults (reference config/default/parts/)
    "default/parts/osc_pose.json": osc_pose(),
    "default/parts/osc_position.json": osc_position(),
    "default/parts/joint_position.json": joint_position_default(),
    "default/parts/joint_velocity.json": joint_velocity(),
    "default/parts/joint_torque.json": joint_torque(),
    "default/parts/ik_pose.json": ik_pose(),
    # per-robot defaults (reference config/robots/ + TPU-port extras so
    # EVERY registered robot resolves a robot-specific file)
    "robots/default_panda.json": basic(),
    "robots/default_sawyer.json": basic(),
    "robots/default_ur5e.json": basic(),
    "robots/default_iiwa.json": basic(),
    "robots/default_kinova3.json": basic(),
    "robots/default_jaco.json": basic(),
    "robots/default_xarm7.json": basic(),
    "robots/default_panda_dex.json": basic(scaling=False),
    "robots/default_baxter.json": basic(arms=("right", "left")),
    "robots/default_gr1.json": gr1_wbik(),
    "robots/default_gr1_fixed_lower_body.json": gr1_mink(),
    "robots/default_gr1_floating_body.json": gr1_floating(),
    "robots/default_pandaomron.json": pandaomron(),
    "robots/default_pandaomron_whole_body_ik.json": pandaomron_wbik(),
    "robots/default_tiago.json": tiago(),
    "robots/default_tiago_whole_body_ik.json": tiago_wbik(),
    "robots/default_spotwitharm.json": spotwitharm(),
    "robots/default_spotarm.json": basic(),
}


def main():
    for rel, cfg in FILES.items():
        path = os.path.join(ROOT, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cfg, f, indent=1)
            f.write("\n")
        print(f"wrote {os.path.relpath(path, os.path.join(ROOT, '..', '..'))}")


if __name__ == "__main__":
    main()
