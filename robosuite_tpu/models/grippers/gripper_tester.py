"""Gripper test harness (reference models/grippers/gripper_tester.py:1-235).

Builds a minimal world — gripper hanging over a box — closes the fingers,
and checks the object is grasped (fingerpads in contact) and held. Used by
the gripper unit tests; usable standalone for new gripper models.
"""

from __future__ import annotations

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.models.grippers import gripper_factory
from robosuite_tpu.models.objects import BoxObject
from robosuite_tpu.models.tasks import make_world_option


class GripperTester:
    def __init__(self, gripper_name: str, box_size=(0.018, 0.018, 0.018), gripper_low_pos=0.185):
        self.gripper = gripper_factory(gripper_name, idn=0, arm="right")
        ms = S.ModelSpec("gripper_test", make_world_option())
        w = ms.worldbody
        w.add_geom(S.GeomSpec("floor", type="plane", size=(1, 1, 0.1)))

        # gripper hangs from a vertical slide joint for lowering/raising
        mount = w.add_body(S.BodySpec("mount", pos=(0, 0, 0.30)))
        mount.add_joint(S.JointSpec("mount_z", type="slide", axis=(0, 0, 1), damping=50.0, armature=1.0))
        mount.inertial = S.InertialSpec(mass=1.0, diaginertia=(0.01, 0.01, 0.01))
        sub = self.gripper.root_subtree()
        # orient gripper pointing down (palm -z)
        sub.quat = np.array([0.0, 1.0, 0.0, 0.0])
        mount.children.append(sub)
        for a in self.gripper.actuators():
            ms.actuators.append(a)
        for e in self.gripper.equalities():
            ms.equalities.append(e)
        for t in self.gripper.tendons():
            ms.tendons.append(t)
        ms.add_actuator(S.ActuatorSpec("lift_z", joint="mount_z", kind="position", kp=500.0, ctrlrange=(-0.3, 0.3)))

        self.box = BoxObject("obj", size=box_size, density=200.0)
        w.children.append(self.box.get_obj())

        self.model = ms.compile()
        self.lift_act = self.model.actuator_name2id("lift_z")
        self.grip_act = np.array([self.model.actuator_name2id(n) for n in self.gripper.actuator_names])
        self.box_qpos = self.model.jnt_qpos_slice("obj_joint0")
        self.gripper_low_pos = gripper_low_pos

    def run(self, n_steps_per_phase=150):
        """Phases: lower -> close -> lift. Returns dict of outcome metrics."""
        import jax
        import jax.numpy as jnp

        from robosuite_tpu.physics import engine
        from robosuite_tpu.physics.state import State

        m = self.model
        state = State.make(m)
        qpos = np.asarray(state.qpos).copy()
        # box under the gripper
        qpos[self.box_qpos][:3] = [0, 0, 0.018]
        qpos[self.box_qpos.start : self.box_qpos.start + 3] = [0, 0, 0.019]
        # gripper initial fingers
        if len(self.gripper.init_qpos):
            gj = [m.jnt_name2id(n) for n in self.gripper.joint_names]
            for j, v in zip(gj, np.asarray(self.gripper.init_qpos)):
                qpos[m.jnt_qposadr[j]] = v
        state = state.replace(qpos=jnp.asarray(qpos, dtype=jnp.float32))

        ctrl_ranges = np.asarray(m.actuator_ctrlrange)
        direction = self.gripper.format_action_direction()

        def make_ctrl(lift, grip_cmd):
            c = np.zeros(m.nu, dtype=np.float32)
            c[self.lift_act] = lift
            lo = ctrl_ranges[self.grip_act, 0]
            hi = ctrl_ranges[self.grip_act, 1]
            bias, weight = 0.5 * (hi + lo), 0.5 * (hi - lo)
            c[self.grip_act] = bias + weight * np.clip(direction * grip_cmd, -1, 1)
            return jnp.asarray(c)

        stepn = jax.jit(lambda s, c: engine.step_n(m, s, c, 25), static_argnums=())
        # lower
        for _ in range(n_steps_per_phase // 25):
            state = stepn(state, make_ctrl(-self.gripper_low_pos, -1.0))
        # close
        for _ in range(n_steps_per_phase // 25):
            state = stepn(state, make_ctrl(-self.gripper_low_pos, 1.0))
        z_before = float(state.qpos[self.box_qpos.start + 2])
        # lift
        for _ in range(2 * n_steps_per_phase // 25):
            state = stepn(state, make_ctrl(0.15, 1.0))
        z_after = float(state.qpos[self.box_qpos.start + 2])
        return {
            "z_before_lift": z_before,
            "z_after_lift": z_after,
            "lifted": z_after > z_before + 0.05,
            "finite": bool(np.isfinite(np.asarray(state.qpos)).all()),
        }
