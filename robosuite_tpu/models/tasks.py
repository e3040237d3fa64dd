"""Task assembly: arena + robots + objects -> one world ModelSpec.

Re-derivation of reference models/tasks/task.py:60-123 (ManipulationTask
XML merge) as spec-tree grafting. Child order matches the reference's merged
worlds exactly (arena bodies, mocap eef targets, robots, objects) so joint /
body / actuator ordering — and therefore qpos/qvel layout — lines up 1:1
with robosuite's compiled models (validated against golden fixtures).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from robosuite_tpu import macros
from robosuite_tpu.models import spec as S


def make_world_option():
    """Physics options stamped into every world (reference
    models/assets/base.xml:3-5 + world.py:14-15)."""
    return S.OptionSpec(
        timestep=macros.SIMULATION_TIMESTEP,
        gravity=(0, 0, -9.81),
        impratio=20.0,
        density=1.2,
        viscosity=0.00002,
    )


def _add_eef_targets(ms: S.ModelSpec):
    """Mocap-style eef target bodies the reference's RobotEnv injects
    (robot_env.py; bodies 'left_eef_target'/'right_eef_target' in every
    merged world). Static visual-only bodies here (no mocap support yet)."""
    for side in ("left", "right"):
        b = ms.worldbody.add_body(S.BodySpec(f"{side}_eef_target", pos=(0, 0, -1)))
        b.add_geom(
            S.GeomSpec(f"{side}_eef_target_box", type="box", size=(0.05, 0.05, 0.05), contype=0, conaffinity=0, group=2, rgba=(0.898, 0.420, 0.435, 0.5))
        )
        b.add_geom(
            S.GeomSpec(f"{side}_eef_target_sphere", type="sphere", size=(0.01,), contype=0, conaffinity=0, group=2, rgba=(0.898, 0.420, 0.435, 0.8))
        )


class ManipulationTask:
    """Composes the full manipulation world (reference tasks/task.py:60-123).

    Args:
        arena: Arena instance (its spec is consumed)
        robots: list of ManipulatorModel (already based/grippered)
        objects: list of MujocoObject
    """

    def __init__(self, mujoco_arena, mujoco_robots, mujoco_objects=None):
        self.arena = mujoco_arena
        self.robots = mujoco_robots if isinstance(mujoco_robots, (list, tuple)) else [mujoco_robots]
        objs = mujoco_objects
        if objs is None:
            objs = []
        elif not isinstance(objs, (list, tuple)):
            objs = [objs]
        self.objects = list(objs)

        ms = S.ModelSpec("manipulation_task", make_world_option())
        # arena first (floor/table geoms + cameras on worldbody)
        for g in self.arena.spec.worldbody.geoms:
            ms.worldbody.geoms.append(g)
        for st in self.arena.spec.worldbody.sites:
            ms.worldbody.sites.append(st)
        for c in self.arena.spec.worldbody.cameras:
            ms.worldbody.cameras.append(c)
        for lt in self.arena.spec.worldbody.lights:
            ms.worldbody.lights.append(lt)
        for b in self.arena.spec.worldbody.children:
            ms.worldbody.children.append(b)

        _add_eef_targets(ms)

        for robot in self.robots:
            ms.worldbody.children.append(robot.root_subtree())
            for a in robot.actuators():
                ms.actuators.append(a)
            for e in robot.equalities():
                ms.equalities.append(e)
            for t in robot.tendons():
                ms.tendons.append(t)

        for obj in self.objects:
            ms.worldbody.children.append(obj.get_obj())
            if hasattr(obj, "meshes"):
                ms.meshes.update(obj.meshes())

        self.spec = ms

        # instance/class bookkeeping for segmentation id mappings
        # (reference tasks/task.py:125-194 generate_id_mappings)
        def subtree_geoms(body):
            names = [g.name for g in body.geoms]
            for ch in body.children:
                names += subtree_geoms(ch)
            return names

        self._instances = []
        arena_geoms = [g.name for g in self.arena.spec.worldbody.geoms]
        for b in self.arena.spec.worldbody.children:
            arena_geoms += subtree_geoms(b)
        self._instances.append(("arena", type(self.arena).__name__, arena_geoms))
        for i, robot in enumerate(self.robots):
            self._instances.append(
                (f"robot{getattr(robot, 'idn', i)}", type(robot).__name__,
                 subtree_geoms(robot.root_subtree()))
            )
        for obj in self.objects:
            self._instances.append(
                (getattr(obj, "name", type(obj).__name__), type(obj).__name__,
                 subtree_geoms(obj.get_obj()))
            )

    def generate_id_mappings(self, model):
        """geom id -> instance name / class name maps for segmentation
        (reference tasks/task.py:125-194). Returns
        (geom_ids_to_instances, geom_ids_to_classes)."""
        inst_map, cls_map = {}, {}
        for inst, cls, names in self._instances:
            for n in names:
                if n in model.geom_names:
                    gid = model.geom_name2id(n)
                    inst_map[gid] = inst
                    cls_map[gid] = cls
        return inst_map, cls_map

    def compile(self, dtype=np.float32):
        return self.spec.compile(dtype=dtype)
