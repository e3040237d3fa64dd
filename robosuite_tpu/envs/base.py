"""Environment base: the functional gym-style simulation API.

Re-derivation of the reference environment layer (environments/base.py:59-853
MujocoEnv, robot_env.py RobotEnv, manipulation_env.py ManipulationEnv) with
the hot loop inverted for TPU: instead of a Python loop calling into C
25 times per policy step (reference base.py:494-505), `step` is one jitted
function containing a lax.scan over substeps with the controller law fused
in; `reset` is pure (counter-based RNG), and both vmap over a batch axis.

Registry + make() mirror reference environments/base.py:16-56.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from robosuite_tpu import macros
from robosuite_tpu.models.bases import robot_base_factory
from robosuite_tpu.models.grippers import gripper_factory
from robosuite_tpu.models.robots import create_robot
from robosuite_tpu.physics import engine
from robosuite_tpu.physics.state import KinData, State
from robosuite_tpu.robots import FixedBaseRobot, RobotCtrlState

REGISTERED_ENVS: Dict[str, type] = {}


def register_env(cls):
    REGISTERED_ENVS[cls.__name__] = cls
    return cls


class _EnvList:
    def __iter__(self):
        return iter(sorted(REGISTERED_ENVS))

    def __contains__(self, k):
        return k in REGISTERED_ENVS

    def __repr__(self):
        return repr(sorted(REGISTERED_ENVS))


ALL_ENVIRONMENTS = _EnvList()


def make(env_name: str, *args, **kwargs):
    """reference environments/base.py:23-42."""
    if env_name not in REGISTERED_ENVS:
        raise ValueError(f"unknown env {env_name}; known: {sorted(REGISTERED_ENVS)}")
    return REGISTERED_ENVS[env_name](*args, **kwargs)


@struct.dataclass
class EnvState:
    """Full env state: physics + controller + episode bookkeeping."""

    physics: State
    ctrl: RobotCtrlState
    t: Any          # policy step count
    rng: Any        # jax PRNG key
    task_state: Any = None  # per-env extra state (e.g. Wipe's wiped markers)
    obs_cache: Any = None   # Observable pipeline cache (delay/sampling-rate
                            # stale values, observables.compute_observables)


class RobotEnv:
    """Host-side env handle; builds the world once and exposes pure
    reset/step functions (jit/vmap-able)."""

    def __init__(
        self,
        robots="Panda",
        controller_configs=None,
        control_freq=macros.DEFAULT_CONTROL_FREQ,
        horizon=macros.DEFAULT_HORIZON,
        reward_scale=1.0,
        reward_shaping=False,
        initialization_noise="default",
        use_camera_obs=False,
        camera_names=("agentview",),
        camera_heights=84,
        camera_widths=84,
        camera_depths=False,
        gripper_types="default",
        base_types="default",
        dtype=np.float32,
    ):
        self.robot_names = [robots] if isinstance(robots, str) else list(robots)
        self.use_camera_obs = use_camera_obs
        self.camera_names = [camera_names] if isinstance(camera_names, str) else list(camera_names)
        self.camera_heights = camera_heights
        self.camera_widths = camera_widths
        self.camera_depths = camera_depths
        self.control_freq = control_freq
        self.horizon = horizon
        self.reward_scale = reward_scale
        self.reward_shaping = reward_shaping
        self.n_substeps = int(round(1.0 / (control_freq * macros.SIMULATION_TIMESTEP)))
        # reference robot.py:234-300: "default" -> gaussian 0.02
        if initialization_noise == "default":
            self.init_noise_mag = 0.02
        elif initialization_noise is None:
            self.init_noise_mag = 0.0
        else:
            self.init_noise_mag = float(initialization_noise.get("magnitude", 0.02))

        # --- build robot models (reference robot_env.py:597 _load_robots) ----
        # gripper_types / base_types: "default" -> per-robot default; a str /
        # None applies to all robots; a list gives one per robot (reference
        # robot_env.py:126-155 gripper_types plumbing).
        def _per_robot(spec, i):
            return spec[i] if isinstance(spec, (list, tuple)) else spec

        self.robot_models = []
        for i, name in enumerate(self.robot_names):
            rm = create_robot(name, idn=i)
            base_t = _per_robot(base_types, i)
            rm.add_base(robot_base_factory(rm.default_base if base_t == "default" else base_t, idn=i))
            grip_t = _per_robot(gripper_types, i)
            for arm in rm.arms:
                gname = rm.default_gripper[arm] if grip_t == "default" else grip_t
                g = gripper_factory(gname, idn=i, arm=arm)
                rm.add_gripper(g, arm)
            self.robot_models.append(rm)

        # --- task-specific world (subclass hook) ------------------------------
        self._load_model()
        self.model = self.task.compile(dtype=dtype)

        # --- runtime robots ---------------------------------------------------
        cfgs = controller_configs if controller_configs is not None else [None] * len(self.robot_models)
        if not isinstance(cfgs, (list, tuple)):
            cfgs = [cfgs] * len(self.robot_models)
        # reference robots/__init__.py:15-34 ROBOT_CLASS_MAPPING: wheeled and
        # legged robots get the MobileRobot runtime (torso/head/base parts)
        from robosuite_tpu.robots.robot import LeggedRobot, MobileRobot

        self.robots = [
            (
                LeggedRobot if getattr(rm, "robot_kind", "fixed") == "legged"
                else MobileRobot if getattr(rm, "robot_kind", "fixed") == "wheeled"
                else FixedBaseRobot
            )(self.model, rm, cfg)
            for rm, cfg in zip(self.robot_models, cfgs)
        ]

        self._setup_references()
        self._model_dtype = dtype
        self._controller_cfgs = cfgs

        # jitted entry points
        self._refresh_jit()

    def _refresh_jit(self):
        """(Re)create the jitted entry points — call after any change to
        self.model so the next trace captures the new constants."""
        lo, hi = self.action_spec
        self._action_clip = (jnp.asarray(lo), jnp.asarray(hi))
        self._reset_jit = jax.jit(self._reset_impl)
        self._step_jit = jax.jit(self._step_impl)
        for attr in ("_reset_batch_jit", "_step_batch_jit", "_rollout_jit"):
            if hasattr(self, attr):
                delattr(self, attr)

    def rebuild_model(self):
        """Recompile the world from the (possibly edited) task spec and
        rebuild the runtime robots — the analog of the reference's
        hard-reset XML-processor path (environments/base.py:290-295,
        visualization_wrapper.py:74-80)."""
        from robosuite_tpu.robots.robot import LeggedRobot, MobileRobot

        self.model = self.task.compile(dtype=self._model_dtype)
        self.robots = [
            (
                LeggedRobot if getattr(rm, "robot_kind", "fixed") == "legged"
                else MobileRobot if getattr(rm, "robot_kind", "fixed") == "wheeled"
                else FixedBaseRobot
            )(self.model, rm, cfg)
            for rm, cfg in zip(self.robot_models, self._controller_cfgs)
        ]
        self._setup_references()
        self._refresh_jit()

    # -- subclass hooks --------------------------------------------------------
    def _load_model(self):
        raise NotImplementedError

    def _setup_references(self):
        pass

    def reward(self, obs_dict, physics_state, kin):
        return jnp.asarray(0.0)

    def _check_success(self, physics_state, kin):
        return jnp.asarray(False)

    def _sample_placements(self, rng):
        """Return qpos updates for object placement: (idx, values) or None."""
        return None

    # -- observable pipeline ---------------------------------------------------
    # The reference runs every observation through a declarative
    # corrupter -> filter -> delay pipeline and aggregates per modality into
    # "<modality>-state" vectors (utils/observables.py:157-259,
    # environments/base.py:429-465). Here the pipeline post-processes the
    # env's raw obs dict: each raw key gets a default Observable (clean
    # passthrough), overridable per key via `modify_observable`.

    def _default_modality(self, key):
        if key.endswith("_image") or key.endswith("_depth"):
            return None  # camera obs bypass the pipeline
        if key in ("placement_valid",):
            return None
        for i in range(len(self.robots)):
            if key.startswith(f"robot{i}_"):
                return f"robot{i}_proprio"
        return "object"

    def modify_observable(self, name, **overrides):
        """Override pipeline stages for one observable (reference
        environments/base.py modify_observable): corrupter=, filter=,
        delay=, update_every=, enabled=, active=. Takes effect on the next
        trace (call before stepping, or re-jit via _refresh_jit)."""
        if not hasattr(self, "_obs_overrides"):
            self._obs_overrides = {}
        self._obs_overrides.setdefault(name, {}).update(overrides)
        self._refresh_jit()

    def _observables_for(self, raw_keys):
        from robosuite_tpu.observables import Observable, sensor

        overrides = getattr(self, "_obs_overrides", {})
        specs = []
        for k in raw_keys:
            modality = self._default_modality(k)
            if modality is None:
                continue
            ov = overrides.get(k, {})

            def make_sensor(key, mod):
                def fn(ctx):
                    return ctx[key]

                fn.__modality__ = mod
                return fn

            specs.append(Observable(
                name=k, sensor=make_sensor(k, modality),
                corrupter=ov.get("corrupter"), filter=ov.get("filter"),
                delay=ov.get("delay", 0), update_every=ov.get("update_every", 1),
                enabled=ov.get("enabled", True), active=ov.get("active", True),
            ))
        return specs

    def _finalize_observations(self, obs, rng, t, cache=None):
        """Run the Observable pipeline over the raw obs dict; adds
        '<modality>-state' aggregation keys (robot0_proprio-state,
        object-state — the reference obs-dict contract)."""
        from robosuite_tpu.observables import compute_observables

        specs = self._observables_for(list(obs.keys()))
        piped, new_cache = compute_observables(specs, obs, rng, t, cache=cache)
        out = dict(obs)
        out.update(piped)
        needs_cache = any(s.delay > 0 or s.update_every > 1 for s in specs)
        return out, (new_cache if needs_cache else None)

    def _get_observations(self, physics_state, kin):
        return {}

    def _camera_observations(self, kin):
        """Ray-cast camera images (reference robot_env.py:383-517 camera
        sensors; rendered in-graph instead of via GL)."""
        from robosuite_tpu.renderers.raycast import render_camera

        obs = {}
        for cam in self.camera_names:
            rgb, depth = render_camera(self.model, kin, cam, self.camera_heights, self.camera_widths)
            obs[f"{cam}_image"] = rgb
            if self.camera_depths:
                obs[f"{cam}_depth"] = depth
        return obs

    # -- contact queries (reference manipulation_env.py:331-376 _check_grasp,
    # base.py check_contact) ---------------------------------------------------
    def _pair_point_rows(self):
        """Map candidate-pair index -> contact-buffer row indices (static).

        Delegates to contact.contact_row_layout — the buffer is GROUP-major,
        not pair-index-major (a naive in-order mapping silently queried the
        wrong rows for every pair after the first type group)."""
        from robosuite_tpu.physics.contact import contact_row_layout

        if not hasattr(self, "_pair_rows_cache"):
            self._pair_rows_cache = contact_row_layout(self.model)
        return self._pair_rows_cache

    def _contact_rows(self, geoms_a, geoms_b):
        """Static contact-buffer rows for pairs between two geom name sets."""
        geoms_a, geoms_b = set(geoms_a), set(geoms_b)
        rows = []
        pr = self._pair_point_rows()
        for k in range(self.model.npair):
            g1 = self.model.geom_names[self.model.pair_geom1[k]]
            g2 = self.model.geom_names[self.model.pair_geom2[k]]
            if (g1 in geoms_a and g2 in geoms_b) or (g2 in geoms_a and g1 in geoms_b):
                rows.extend(pr[k])
        return np.asarray(rows, dtype=np.int32)

    def _rows_to_pairs(self, rows):
        """Static map of contact-buffer rows back to their pair indices."""
        layout = self._pair_point_rows()
        want = set(int(r) for r in np.asarray(rows).tolist())
        return sorted(k for k, rws in layout.items() if want & set(rws))

    def _any_contact(self, kin, rows):
        """True if any of the given contact rows is touching.

        Runs narrowphase restricted to the rows' own pairs — contact queries
        inside reward evaluations were re-running the FULL candidate buffer
        per planned step, dominating MPC planning rollouts."""
        from robosuite_tpu.physics import contact as cmod

        if rows.size == 0:
            return jnp.asarray(False)
        pairs = self._rows_to_pairs(rows)
        if kin.pair_dist is not None:
            # kin-lite from the fused planning rollout carries per-pair
            # min distances — no narrowphase re-run
            return jnp.any(kin.pair_dist[jnp.asarray(pairs)] < 0.0)
        con = cmod.narrowphase(self.model, kin, pairs=pairs)
        return jnp.any(con["dist"] < 0.0)

    def _subtree_bodies(self, root_body):
        """Static list of body ids in root_body's subtree (inclusive)."""
        m = self.model
        out = []
        for b in range(m.nbody):
            k = b
            while True:
                if k == root_body:
                    out.append(b)
                    break
                if k == 0:
                    break
                k = m.body_parentid[k]
        return out

    def _wrench_rows(self, subtree):
        """Static (row, sign) list: contact rows with exactly one side in
        `subtree`; sign +1 when body2 is the subtree side (row force acts
        ON the subtree along +normal)."""
        from robosuite_tpu.physics import contact as cmod

        sub = set(subtree)
        layout = cmod.contact_row_layout(self.model)
        m = self.model
        out = []
        for k in range(m.npair):
            b1 = int(m.geom_bodyid[m.pair_geom1[k]])
            b2 = int(m.geom_bodyid[m.pair_geom2[k]])
            if (b1 in sub) == (b2 in sub):
                continue
            sign = 1.0 if b2 in sub else -1.0
            for r in layout[k]:
                out.append((r, sign, k))
        return out

    def eef_contact_wrench(self, kin, f, robot_idx, arm):
        """(force (3,), torque (3,)) of contact forces on the gripper
        subtree about the eef site — the analog of the reference's
        eef force/torque sensors (robots/robot.py:795-814, mounted MuJoCo
        F/T sensor). Computed from the contact solver's force vector `f`
        (last substep) with row geometry from the end-of-step narrowphase;
        gravity/inertial transmission is not included (contact forces are
        the operative term for force-limit logic — Wipe's thresholds)."""
        from robosuite_tpu.physics import contact as cmod

        robot = self.robots[robot_idx]
        site = robot.eef_site_id[arm]
        site_body = int(self.model.site_bodyid[site])
        key = (robot_idx, arm)
        if not hasattr(self, "_wrench_rows_cache"):
            self._wrench_rows_cache = {}
        if key not in self._wrench_rows_cache:
            # subtree root = highest gripper-prefixed ancestor of the eef
            # body (the eef site sits on a leaf; finger bodies are siblings)
            m = self.model
            root = site_body
            k = site_body
            while k != 0:
                if m.body_names[k].startswith(f"gripper{robot_idx}_"):
                    root = k
                k = m.body_parentid[k]
            sub = self._subtree_bodies(root)
            self._wrench_rows_cache[key] = self._wrench_rows(sub)
        rows = self._wrench_rows_cache[key]
        zero = jnp.zeros(3, dtype=kin.site_xpos.dtype)
        if not rows or f is None or f.shape[0] == 0:
            return zero, zero
        if cmod.uses_row_compaction(self.model):
            # big worlds compact active rows into dynamic slots — the
            # static row->f mapping below does not apply (no F/T obs there)
            return zero, zero
        R = sum(len(v) for v in cmod.contact_row_layout(self.model).values())
        pairs = sorted({k for _, _, k in rows})
        con = cmod.narrowphase(self.model, kin, pairs=pairs)
        # map full-buffer row index -> subset row index
        sub_layout = {}
        i = 0
        full_layout = cmod.contact_row_layout(self.model)
        for k in sorted(pairs, key=lambda k: full_layout[k][0]):
            for r in full_layout[k]:
                sub_layout[r] = i
                i += 1
        ridx = np.array([sub_layout[r] for r, _, _ in rows], dtype=np.int32)
        fidx = np.array([r for r, _, _ in rows], dtype=np.int32)
        signs = jnp.asarray(np.array([s for _, s, _ in rows], dtype=np.float32))
        n = con["normal"][ridx]
        t1 = con["t1"][ridx]
        t2 = con["t2"][ridx]
        pos = con["pos"][ridx]
        fw = (
            n * f[fidx][:, None]
            + t1 * f[R + fidx][:, None]
            + t2 * f[2 * R + fidx][:, None]
        ) * signs[:, None]
        force = jnp.sum(fw, axis=0)
        torque = jnp.sum(jnp.cross(pos - kin.site_xpos[site][None, :], fw), axis=0)
        return force, torque

    def check_grasp(self, kin, left_rows, right_rows):
        """Both fingerpads touching the object (manipulation_env.py:331-376)."""
        return self._any_contact(kin, left_rows) & self._any_contact(kin, right_rows)

    def grasp_rows(self, robot_idx, arm, object_geoms):
        """(left_rows, right_rows) for a gripper vs an object's geoms."""
        grip = self.robot_models[robot_idx].grippers[arm]
        left = self._contact_rows(grip.important_geoms["left_fingerpad"], object_geoms)
        right = self._contact_rows(grip.important_geoms["right_fingerpad"], object_geoms)
        return left, right

    # -- action space ----------------------------------------------------------
    @property
    def action_dim(self) -> int:
        return sum(r.action_dim for r in self.robots)

    @property
    def action_spec(self):
        """Per-dim bounds (reference env_base action_spec): [-1, 1] except
        variable-impedance dims, which carry kp/damping-ratio ranges."""
        lows, highs = [], []
        for r in self.robots:
            lo, hi = r.action_limits
            lows.append(lo)
            highs.append(hi)
        return np.concatenate(lows), np.concatenate(highs)

    # -- core functional API ---------------------------------------------------
    def _initial_qpos(self, rng):
        qpos = jnp.asarray(self.model.qpos0)
        keys = jax.random.split(rng, len(self.robots) + 1)
        for i, (robot, rm) in enumerate(zip(self.robots, self.robot_models)):
            iq = jnp.asarray(np.concatenate([np.asarray(rm.init_qpos).reshape(-1)]), dtype=qpos.dtype)
            noise = self.init_noise_mag * jax.random.normal(keys[i], iq.shape, dtype=qpos.dtype)
            # init_qpos covers all card joints (torso+head+arms for mobile
            # manipulators), reference robot.py:234-300
            qpos = qpos.at[jnp.asarray(robot.init_qpos_idx)].set(iq + noise)
            itq = rm.init_torso_qpos
            if itq is not None and getattr(robot, "part_qpos_idx", {}).get("torso") is not None:
                tidx = robot.part_qpos_idx["torso"]
                base_torso = tidx[-len(np.atleast_1d(itq)):]
                qpos = qpos.at[jnp.asarray(base_torso)].set(jnp.asarray(itq, dtype=qpos.dtype))
            # legged bases carry their own standing pose (reference
            # spot_base.py:26-28 Spot.init_qpos applied to base leg joints)
            if rm.base is not None and len(np.atleast_1d(rm.base.init_qpos)) and rm.base.leg_joints:
                ljids = [self.model.jnt_name2id(n) for n in rm.base.leg_joints]
                lidx = np.array([self.model.jnt_qposadr[j] for j in ljids])
                biq = np.asarray(rm.base.init_qpos, dtype=np.float64)[: len(lidx)]
                qpos = qpos.at[jnp.asarray(lidx)].set(jnp.asarray(biq, dtype=qpos.dtype))
            for arm in robot.arms:
                grip = rm.grippers.get(arm)
                if grip is not None and len(robot.gripper_joint_qpos_idx[arm]):
                    qpos = qpos.at[jnp.asarray(robot.gripper_joint_qpos_idx[arm])].set(
                        jnp.asarray(grip.init_qpos, dtype=qpos.dtype)
                    )
        return qpos, keys[-1]

    def _reset_impl(self, rng):
        qpos, rng = self._initial_qpos(rng)
        placement = self._sample_placements(rng)
        placement_valid = jnp.asarray(True)
        if placement is not None:
            if len(placement) == 4:
                idx, vals, rng, placement_valid = placement
            else:
                idx, vals, rng = placement
            qpos = qpos.at[idx].set(vals)
        physics = State(qpos=qpos, qvel=jnp.zeros(self.model.nv, dtype=qpos.dtype), time=jnp.asarray(0.0, dtype=qpos.dtype))
        kin, M, bias = engine.forward_products(self.model, physics)
        ctrl_states = [r.init_ctrl_state(kin, M, bias, physics.qpos, physics.qvel) for r in self.robots]
        state = EnvState(physics=physics, ctrl=self._pack_ctrl(ctrl_states), t=jnp.asarray(0, dtype=jnp.int32), rng=rng)
        obs = self._get_observations(physics, kin)
        # eef F/T observables exist from reset (zero contact forces) so the
        # reset/step obs dicts share one key set (gym space consistency)
        f0 = engine.warmstart_zeros(self.model, dtype=qpos.dtype)
        for i, r in enumerate(self.robots):
            for arm in r.arms:
                fo, to = self.eef_contact_wrench(kin, f0, i, arm)
                prefix = f"robot{i}_" + ("" if arm == "right" or len(r.arms) == 1 else f"{arm}_")
                obs[f"{prefix}eef_force"] = fo
                obs[f"{prefix}eef_torque"] = to
        # all-candidates-invalid placement draw (reference would raise
        # RandomizationError, placement_samplers.py:274-309)
        obs["placement_valid"] = placement_valid
        rng_obs, rng_next = jax.random.split(state.rng)
        obs, obs_cache = self._finalize_observations(obs, rng_obs, state.t)
        state = state.replace(rng=rng_next, obs_cache=obs_cache)
        if self.use_camera_obs:
            obs.update(self._camera_observations(kin))
        return state, obs

    def state_from_flattened(self, flat, rng=None):
        """Build a full EnvState from a flattened (time, qpos, qvel) state —
        the analog of reference set_state_from_flattened + controller reset
        (binding_utils.py:1155-1184, used by demo playback / DemoSampler)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        physics = State.from_flattened(jnp.asarray(flat, dtype=jnp.asarray(self.model.qpos0).dtype), self.model)
        kin, M, bias = engine.forward_products(self.model, physics)
        ctrl_states = [r.init_ctrl_state(kin, M, bias, physics.qpos, physics.qvel) for r in self.robots]
        return EnvState(
            physics=physics, ctrl=self._pack_ctrl(ctrl_states), t=jnp.asarray(0, dtype=jnp.int32), rng=rng
        )

    def _pack_ctrl(self, ctrl_states):
        if len(ctrl_states) == 1:
            return ctrl_states[0]
        return tuple(ctrl_states)

    def _unpack_ctrl(self, ctrl):
        if len(self.robots) == 1:
            return [ctrl]
        return list(ctrl)

    def _split_robot_actions(self, action):
        out = []
        i = 0
        for r in self.robots:
            out.append(action[..., i : i + r.action_dim])
            i += r.action_dim
        return out

    def _fused_for(self, model, emit_aux=False):
        """Fused-substep megakernel for `model`, or None when unsupported.
        Keyed by model identity (the cache holds the model ref so ids stay
        valid); a DR-modified model gets its own build."""
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        key = (id(model), emit_aux)
        if key not in self._fused_cache:
            from robosuite_tpu.ops.pallas_substep import UnsupportedFused, make_fused_substep

            try:
                fn = make_fused_substep(self, model, emit_aux=emit_aux)
            except UnsupportedFused:
                fn = None
            self._fused_cache[key] = (model, fn)
        return self._fused_cache[key][1]

    def make_plan_return(self, model, n_substeps):
        """rollout_return(env_state, seq, discounts) for MPC planning: roll
        the whole action sequence, return the discounted reward sum.

        Fused form (when the megakernel covers this world): the kernel's
        POST-step aux (site/body poses + per-pair min dists) feeds both the
        reward and the next step's set_goals, so the scan runs with ZERO
        forward-products calls after the initial one. Falls back to the
        product-carrying scan otherwise."""
        import numpy as np_

        fused = self._fused_for(model, emit_aux=True) if not getattr(self, "_disable_fused", False) else None
        if fused is None:
            def rollout_return(env_state, seq, discounts):
                kin0, M0, b0 = engine.forward_products(model, env_state.physics)

                def body(carry, a):
                    s, kin, M, bias = carry
                    s2, r, kin2, M2, b2 = self._rollout_with_products(
                        s, a, model, n_substeps, kin, M, bias
                    )
                    return (s2, kin2, M2, b2), r

                _, rewards = jax.lax.scan(body, (env_state, kin0, M0, b0), seq)
                return jnp.sum(rewards * discounts)

            return rollout_return

        from robosuite_tpu.controllers.parts import osc as osc_mod

        robot = self.robots[0]
        armn = robot.arms[0]
        cfg = robot.arm_cfg[armn]
        cen = robot.center_site_id[armn]
        nv, nbody, ngeom = model.nv, model.nbody, model.ngeom
        dt = model.timestep

        def kin_lite(sx, sm, bx, pd, dtype):
            """KinData carrying only what set_goals/rewards may touch; geom
            fields are NaN so any untracked consumer surfaces immediately."""
            z3 = jnp.zeros((nv, 3), dtype)
            nang = jnp.full((ngeom, 3), jnp.nan, dtype)
            nangm = jnp.full((ngeom, 3, 3), jnp.nan, dtype)
            zb = jnp.zeros((nbody, 3), dtype)
            zbm = jnp.zeros((nbody, 3, 3), dtype)
            zq = jnp.zeros((nbody, 4), dtype)
            return KinData(
                xpos=bx, xquat=zq, xmat=zbm, xipos=zb, ximat=zbm,
                sdof_ang=z3, sdof_lin=z3, geom_xpos=nang, geom_xmat=nangm,
                site_xpos=sx, site_xmat=sm, pair_dist=pd,
            )

        M0c = jnp.zeros((nv, nv))
        b0c = jnp.zeros(nv)

        def plan_step(state, action, aux):
            sx, sm, bx, pd = aux
            physics = state.physics
            action = jnp.clip(action, *self._action_clip)
            kl = kin_lite(sx, sm, bx, pd, physics.qpos.dtype)
            ctrl_states = self._unpack_ctrl(state.ctrl)
            robot_actions = self._split_robot_actions(action)
            ctrl_states = [
                r.set_goals(kl, M0c.astype(physics.qpos.dtype), b0c.astype(physics.qpos.dtype),
                            physics.qpos, physics.qvel, cs, a)
                for r, cs, a in zip(self.robots, ctrl_states, robot_actions)
            ]
            packed = self._pack_ctrl(ctrl_states)
            goal_fn = self._fused_goal_fn(robot, armn, ctrl_states[0], kl)
            grip = robot.gripper_ctrl(armn, ctrl_states[0])
            if grip is None:
                grip = jnp.zeros(1, dtype=physics.qpos.dtype)

            def substep(carry, k):
                phys, _aux = carry
                goal, gains = goal_fn(k)
                qpos2, qvel2, _f, sx2, sm2, bx2, pd2 = fused(
                    phys.qpos, phys.qvel, model.body_mass, model.body_inertia,
                    model.gravity, model.dof_armature, goal, gains, grip,
                )
                phys2 = phys.replace(qpos=qpos2, qvel=qvel2, time=phys.time + dt)
                return (phys2, (sx2, sm2, bx2, pd2)), ()

            (physics, aux2), _ = jax.lax.scan(
                substep, (physics, aux), jnp.arange(n_substeps)
            )
            kl2 = kin_lite(*aux2, physics.qpos.dtype)
            reward = self.reward(None, physics, kl2)
            new_state = state.replace(physics=physics, ctrl=packed, t=state.t + 1)
            return new_state, reward, aux2

        def rollout_return(env_state, seq, discounts):
            from robosuite_tpu.physics import contact as cmod

            kin0, _, _ = engine.forward_products(model, env_state.physics)
            pd0 = jnp.zeros((model.npair,), env_state.physics.qpos.dtype)
            aux0 = (kin0.site_xpos, kin0.site_xmat, kin0.xpos, pd0)

            def body(carry, a):
                s, aux = carry
                s2, r, aux2 = plan_step(s, a, aux)
                return (s2, aux2), r

            _, rewards = jax.lax.scan(body, (env_state, aux0), seq)
            return jnp.sum(rewards * discounts)

        return rollout_return

    def _fused_f_zeros(self, model, dtype):
        """Zero solver-force carry for the fused substep (3 rows per capped
        contact point; the fused path requires neq == 0)."""
        from robosuite_tpu.physics import contact as cmod

        R = sum(len(v) for v in cmod.contact_row_layout(model).values())
        return jnp.zeros(3 * R, dtype=dtype)

    def _fused_substep_fn(self, model, ctrl_states, kin):
        """Substep closure using the fused megakernel, or None. Resolves the
        tick-rate quantities (world-frame OSC goal, gripper actuator ctrl)
        here; the kernel runs the substep-rate law."""
        if getattr(self, "_disable_fused", False):
            return None
        fused = self._fused_for(model)
        if fused is None:
            return None
        robot = self.robots[0]
        armn = robot.arms[0]
        goal_fn = self._fused_goal_fn(robot, armn, ctrl_states[0], kin)
        grip = robot.gripper_ctrl(armn, ctrl_states[0])
        if grip is None:
            grip = jnp.zeros(1, dtype=kin.site_xpos.dtype)
        dt = model.timestep

        def substep(carry, k):
            phys, _f_prev = carry
            goal, gains = goal_fn(k)
            qpos2, qvel2, f = fused(
                phys.qpos, phys.qvel, model.body_mass, model.body_inertia,
                model.gravity, model.dof_armature, goal, gains, grip,
            )
            return (phys.replace(qpos=qpos2, qvel=qvel2, time=phys.time + dt), f), ()

        return substep

    def _fused_goal_fn(self, robot, armn, ctrl_state, kin):
        """goal_fn(substep_idx) -> (goal, gains) rows for the fused kernel
        (see ops/pallas_substep.make_fused_substep for the encoding)."""
        from robosuite_tpu.controllers.parts import joint_pos as jp_mod
        from robosuite_tpu.controllers.parts import osc as osc_mod

        cfg = robot.arm_cfg[armn]
        ostate = ctrl_state.arm[armn]
        if isinstance(cfg, jp_mod.JointPosConfig):
            goal = ostate.goal_qpos
            gains = jnp.concatenate([ostate.kp, ostate.kd])

            def goal_fn(k):
                return goal, gains

            return goal_fn
        cen = robot.center_site_id[armn]
        op = kin.site_xpos[cen]
        oR = kin.site_xmat[cen]

        def goal_fn(k):
            despos, desori = osc_mod.desired_world_pose(cfg, ostate, op, oR, k)
            return (jnp.concatenate([despos, desori.reshape(9)]),
                    jnp.concatenate([ostate.kp, ostate.kd]))

        return goal_fn

    def make_plan_dynamics(self, model, n_substeps):
        """Lean dynamics step(state, action) -> state for MPC linearization
        (iLQR FD/jacfwd): set_goals + substeps, NO reward / end-of-step
        forward products — those were ~a third of every finite-difference
        evaluation and their results are discarded by the linearizer."""

        def dyn(state, action):
            action = jnp.clip(action, *self._action_clip)
            physics = state.physics
            kin, M, bias = engine.forward_products(model, physics)
            ctrl_states = self._unpack_ctrl(state.ctrl)
            robot_actions = self._split_robot_actions(action)
            ctrl_states = [
                r.set_goals(kin, M, bias, physics.qpos, physics.qvel, cs, a)
                for r, cs, a in zip(self.robots, ctrl_states, robot_actions)
            ]
            packed = self._pack_ctrl(ctrl_states)
            substep = self._fused_substep_fn(model, ctrl_states, kin)
            if substep is None:
                def substep(carry, k):
                    phys, _f = carry
                    kin, M, bias = engine.forward_products(model, phys)
                    ctrl = jnp.zeros(model.nu, dtype=phys.qpos.dtype)
                    for r, cs in zip(self.robots, ctrl_states):
                        ctrl = r.run_controllers(kin, M, bias, phys.qpos, phys.qvel, cs, ctrl, substep=k)
                    phys2, f = engine.integrate(model, phys, ctrl, kin, M, bias, warm=1)
                    return (phys2, f), ()
                f0 = engine.warmstart_zeros(model, dtype=physics.qpos.dtype)
            else:
                f0 = self._fused_f_zeros(model, physics.qpos.dtype)
            (physics, _), _ = jax.lax.scan(substep, (physics, f0), jnp.arange(n_substeps))
            return state.replace(physics=physics, ctrl=packed, t=state.t + 1)

        return dyn

    def _step_impl(self, state: EnvState, action, model=None):
        action = jnp.clip(action, *self._action_clip)
        model = self.model if model is None else model
        physics = state.physics

        # policy-rate: set goals with the current state (reference
        # fixed_base_robot.py:145-148 policy_step branch)
        kin, M, bias = engine.forward_products(model, physics)
        ctrl_states = self._unpack_ctrl(state.ctrl)
        robot_actions = self._split_robot_actions(action)
        ctrl_states = [
            r.set_goals(kin, M, bias, physics.qpos, physics.qvel, cs, a)
            for r, cs, a in zip(self.robots, ctrl_states, robot_actions)
        ]
        packed = self._pack_ctrl(ctrl_states)

        substep = self._fused_substep_fn(model, ctrl_states, kin)
        if substep is None:
            def substep(carry, k):
                phys, _f = carry
                kin, M, bias = engine.forward_products(model, phys)
                ctrl = jnp.zeros(model.nu, dtype=phys.qpos.dtype)
                for r, cs in zip(self.robots, ctrl_states):
                    ctrl = r.run_controllers(kin, M, bias, phys.qpos, phys.qvel, cs, ctrl, substep=k)
                phys2, f = engine.integrate(model, phys, ctrl, kin, M, bias, warm=1)
                return (phys2, f), ()
            f0 = engine.warmstart_zeros(model, dtype=physics.qpos.dtype)
        else:
            f0 = self._fused_f_zeros(model, physics.qpos.dtype)

        # cold-start contact solve per substep: threading the warm start
        # through the carry measured slower on v5e (see engine.step_n note);
        # the carry's f is the LAST substep's solver forces, feeding the
        # eef force/torque observables below
        (physics, f_last), _ = jax.lax.scan(substep, (physics, f0), jnp.arange(self.n_substeps))

        kin, _, _ = engine.forward_products(model, physics)
        obs = self._get_observations(physics, kin)
        # eef force/torque observables (reference fixed_base_robot.py:155-177
        # recent_ee_forcetorques; robot.py:795-814 F/T sensors)
        for i, r in enumerate(self.robots):
            for arm in r.arms:
                fo, to = self.eef_contact_wrench(kin, f_last, i, arm)
                prefix = f"robot{i}_" + ("" if arm == "right" or len(r.arms) == 1 else f"{arm}_")
                obs[f"{prefix}eef_force"] = fo
                obs[f"{prefix}eef_torque"] = to
        rng_obs, rng_next = jax.random.split(state.rng)
        obs, obs_cache = self._finalize_observations(obs, rng_obs, state.t, cache=state.obs_cache)
        if self.use_camera_obs:
            obs.update(self._camera_observations(kin))
        reward = self.reward(obs, physics, kin)
        t = state.t + 1
        done = t >= self.horizon
        new_state = state.replace(physics=physics, ctrl=packed, t=t, rng=rng_next,
                                  obs_cache=obs_cache)
        return new_state, obs, reward, done, {}

    def _rollout_impl(self, state: EnvState, action, model=None, n_substeps=None):
        """Lean policy step for planners: no observation dict, returns
        (new_state, reward). Same physics/controller path as _step_impl.

        `model` / `n_substeps` let MPC planners roll a coarse-timestep
        planning model (mpc/receding.py): e.g. model.replace(timestep=0.01)
        with n_substeps=5 still covers one 50 ms control period."""
        action = jnp.clip(action, *self._action_clip)
        model = self.model if model is None else model
        n_substeps = self.n_substeps if n_substeps is None else n_substeps
        kin, M, bias = engine.forward_products(model, state.physics)
        new_state, reward, _, _, _ = self._rollout_with_products(
            state, action, model, n_substeps, kin, M, bias
        )
        return new_state, reward

    def _rollout_with_products(self, state: EnvState, action, model, n_substeps, kin, M, bias):
        """_rollout_impl body with the start-of-step forward products passed
        in and the end-of-step products returned — lets MPC planning scans
        carry (kin, M, bias) between consecutive planned steps, halving the
        forward-kernel calls per planned step (the end products of step t
        ARE the start products of step t+1)."""
        action = jnp.clip(action, *self._action_clip)
        physics = state.physics
        ctrl_states = self._unpack_ctrl(state.ctrl)
        robot_actions = self._split_robot_actions(action)
        ctrl_states = [
            r.set_goals(kin, M, bias, physics.qpos, physics.qvel, cs, a)
            for r, cs, a in zip(self.robots, ctrl_states, robot_actions)
        ]
        packed = self._pack_ctrl(ctrl_states)

        substep = self._fused_substep_fn(model, ctrl_states, kin)
        if substep is None:
            def substep(carry, k):
                phys, _f = carry
                kin, M, bias = engine.forward_products(model, phys)
                ctrl = jnp.zeros(model.nu, dtype=phys.qpos.dtype)
                for r, cs in zip(self.robots, ctrl_states):
                    ctrl = r.run_controllers(kin, M, bias, phys.qpos, phys.qvel, cs, ctrl, substep=k)
                phys2, f = engine.integrate(model, phys, ctrl, kin, M, bias, warm=1)
                return (phys2, f), ()
            f0 = engine.warmstart_zeros(model, dtype=physics.qpos.dtype)
        else:
            f0 = self._fused_f_zeros(model, physics.qpos.dtype)

        (physics, _f_last), _ = jax.lax.scan(substep, (physics, f0), jnp.arange(n_substeps))
        kin2, M2, bias2 = engine.forward_products(model, physics)
        reward = self.reward(None, physics, kin2)
        new_state = state.replace(physics=physics, ctrl=packed, t=state.t + 1)
        return new_state, reward, kin2, M2, bias2

    # -- public API ------------------------------------------------------------
    def reset(self, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        return self._reset_jit(rng)

    def step(self, state, action):
        return self._step_jit(state, jnp.asarray(action))

    def reset_batch(self, rngs):
        """vmapped reset over a batch of PRNG keys."""
        if not hasattr(self, "_reset_batch_jit"):
            self._reset_batch_jit = jax.jit(jax.vmap(self._reset_impl))
        return self._reset_batch_jit(rngs)

    def step_batch(self, states, actions):
        if not hasattr(self, "_step_batch_jit"):
            self._step_batch_jit = jax.jit(jax.vmap(self._step_impl))
        return self._step_batch_jit(states, actions)
