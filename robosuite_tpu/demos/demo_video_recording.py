"""Record a rollout as a sequence of frames and assemble an uncompressed
AVI (MJPG-free: raw RGB frames) — no external video deps
(reference demos/demo_video_recording.py uses imageio/ffmpeg).

Usage: python -m robosuite_tpu.demos.demo_video_recording [out.avi] [n_frames]
"""

import struct
import sys

import jax
import numpy as np

import robosuite_tpu
from robosuite_tpu.renderers import RaycastRenderer


def write_avi_rgb(path, frames, fps=20):
    """Minimal uncompressed 24-bit DIB AVI writer (RIFF/AVI, 'DIB ' codec)."""
    h, w = frames[0].shape[:2]
    frame_bytes = []
    for fr in frames:
        bgr = fr[::-1, :, ::-1]  # bottom-up rows, BGR
        row = bgr.tobytes()
        frame_bytes.append(row)
    sz = len(frame_bytes[0])

    def chunk(tag, data):
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack("<14I", int(1e6 / fps), sz * fps, 0, 0x10, len(frames),
                       0, 1, sz, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                           len(frames), sz, 0xFFFFFFFF, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, sz, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))) + \
        b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi" + b"".join(chunk(b"00db", fb) for fb in frame_bytes)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lift_rollout.avi"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    env = robosuite_tpu.make("Lift", robots="Panda", cube_size=[0.021, 0.021, 0.021])
    state, _ = env.reset(jax.random.PRNGKey(0))
    r = RaycastRenderer(env, "agentview", height=120, width=160)
    rng = np.random.default_rng(0)
    frames = []
    for t in range(n_frames):
        action = rng.uniform(-1, 1, env.action_dim).astype(np.float32)
        state, obs, reward, done, info = env.step(state, action)
        rgb, _ = r.render(state)
        frames.append((np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8))
    write_avi_rgb(out, frames)
    print(f"wrote {out}: {len(frames)} frames {frames[0].shape[1]}x{frames[0].shape[0]} @ 20 fps")


if __name__ == "__main__":
    main()
