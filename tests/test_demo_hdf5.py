"""HDF5 demonstration pipeline: collect -> gather -> playback.

Mirrors the reference's open-loop reproducibility contract
(tests/test_environments/test_action_playback.py:17-71 +
scripts/collect_human_demonstrations.py:120-146 HDF5 schema): record states
and actions, rebuild the episode's exact model from the stored MJCF, seed
import pytest
from states[0], replay actions, and require a bit-identical final state.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_collect_gather_playback_bit_exact(tmp_path):
    import h5py

    from robosuite_tpu.scripts.collect_demonstrations import main as collect
    from robosuite_tpu.scripts.playback_demonstrations_from_hdf5 import playback

    path = collect(["--directory", str(tmp_path), "--episodes", "1", "--steps", "6"])

    with h5py.File(path, "r") as f:
        assert "data" in f
        demos = list(f["data"].keys())
        assert len(demos) == 1
        g = f[f"data/{demos[0]}"]
        assert "states" in g and "actions" in g
        assert g["states"].shape[0] == g["actions"].shape[0] + 1
        assert len(g.attrs["model_file"]) > 0
        for attr in ("date", "time", "repository_version", "env"):
            assert attr in f["data"].attrs

    results = playback(path)
    demo, n_actions, deviation = results[0]
    assert n_actions == 6
    assert deviation == 0.0, f"playback not bit-exact: {deviation}"
