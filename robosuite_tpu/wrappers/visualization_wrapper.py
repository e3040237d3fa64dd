"""Visualization wrapper: indicator sites for teleop / debugging.

Re-derivation of reference wrappers/visualization_wrapper.py:23-186 for the
functional engine. Indicator sites are injected into the task's world spec
and the model is recompiled once at wrap time (the analog of the reference's
XML-processor + hard reset, visualization_wrapper.py:74-80). Moving an
indicator is a functional model update (`Model.replace`) followed by a
re-trace of the jitted entry points — intended for episode-level marker
placement; per-frame teleop markers should use a renderer overlay instead.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np

from robosuite_tpu.models import spec as S
from robosuite_tpu.wrappers.wrapper import Wrapper

# reference visualization_wrapper.py:16-20
DEFAULT_INDICATOR_SITE_CONFIG = {
    "type": "sphere",
    "size": [0.03],
    "rgba": [1, 0, 0, 0.5],
}


class VisualizationWrapper(Wrapper):
    def __init__(self, env, indicator_configs=None):
        super().__init__(env)

        self.indicator_configs = None
        if indicator_configs is not None:
            self.indicator_configs = []
            if isinstance(indicator_configs, (str, dict)):
                indicator_configs = [indicator_configs]
            for i, cfg in enumerate(indicator_configs):
                if cfg == "default":
                    cfg = deepcopy(DEFAULT_INDICATOR_SITE_CONFIG)
                    cfg["name"] = f"indicator{i}"
                assert "name" in cfg, "indicator config must specify 'name'"
                self.indicator_configs.append(cfg)

            world = self.env.task.spec.worldbody
            for cfg in self.indicator_configs:
                world.add_site(
                    S.SiteSpec(
                        name=cfg["name"],
                        pos=cfg.get("pos", (0.0, 0.0, 0.0)),
                        size=cfg.get("size", (0.03,)),
                        type=cfg.get("type", "sphere"),
                        rgba=cfg.get("rgba", (1.0, 0.0, 0.0, 0.5)),
                        group=1,  # visual-only: never contributes contacts
                    )
                )
            self.env.rebuild_model()

        # visualization settings (reference :75-76)
        self._vis_settings = {vis: True for vis in getattr(self.env, "_visualizations", ("env", "robots", "grippers"))}

    def get_indicator_names(self):
        if self.indicator_configs is None:
            return []
        return [cfg["name"] for cfg in self.indicator_configs]

    def set_indicator_pos(self, indicator, pos):
        """Move an indicator site (world frame). Functional model update +
        lazy re-jit (reference :96-110 mutates sim.model.body_pos in place)."""
        names = set(self.get_indicator_names())
        assert indicator in names, f"invalid indicator {indicator}; valid: {names}"
        m = self.env.model
        sid = m.site_name2id(indicator)
        import jax.numpy as jnp

        self.env.model = m.replace(site_pos=m.site_pos.at[sid].set(jnp.asarray(np.asarray(pos, dtype=np.float64))))
        self.env._refresh_jit()

    def get_visualization_settings(self):
        return self._vis_settings

    def set_visualization_setting(self, setting, visible):
        assert setting in self._vis_settings, (
            f"invalid setting {setting}; valid: {set(self._vis_settings)}"
        )
        self._vis_settings[setting] = visible
