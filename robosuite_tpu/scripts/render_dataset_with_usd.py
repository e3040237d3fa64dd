"""Render an HDF5 demonstration dataset to time-sampled USD stages for
offline rendering in Omniverse/Blender/usdview (the TPU-native analog of
reference scripts/render_dataset_with_omniverse.py, which requires an
Isaac-Sim install; USD is the interchange format both consume).

Usage: python -m robosuite_tpu.scripts.render_dataset_with_usd \
        --dataset demo.hdf5 [--output /tmp/usd_out] [--env Lift]
"""

import argparse
import os

import numpy as np

import robosuite_tpu
from robosuite_tpu.physics import engine
from robosuite_tpu.utils.usd.exporter import USDExporter


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True, help="HDF5 demo file")
    parser.add_argument("--output", type=str, default="/tmp/usd_out")
    parser.add_argument("--env", type=str, default="Lift")
    parser.add_argument("--robots", nargs="+", type=str, default=["Panda"])
    args = parser.parse_args()

    import h5py

    os.makedirs(args.output, exist_ok=True)
    robots = args.robots if len(args.robots) > 1 else args.robots[0]
    env = robosuite_tpu.make(args.env, robots=robots)
    with h5py.File(args.dataset, "r") as f:
        for demo in sorted(f["data"].keys()):
            states = np.asarray(f[f"data/{demo}/states"])
            exporter = USDExporter(env.model, framerate=env.control_freq)
            for flat in states:
                st = env.state_from_flattened(np.asarray(flat))
                kin, _, _ = engine.forward_products(env.model, st.physics)
                exporter.update_scene(kin)
            out = os.path.join(args.output, f"{demo}.usda")
            exporter.save_scene(out)
            print(f"{demo}: {len(states)} frames -> {out}")


if __name__ == "__main__":
    main()
