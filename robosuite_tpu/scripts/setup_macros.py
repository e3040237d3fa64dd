"""Generate a private macros override file (reference scripts/setup_macros.py).

Copies robosuite_tpu/macros.py to macros_private.py next to it so users can
override global flags without touching the package source.
"""

import os
import shutil


def main():
    import robosuite_tpu.macros as m

    src = m.__file__
    dst = os.path.join(os.path.dirname(src), "macros_private.py")
    if os.path.exists(dst):
        print(f"{dst} already exists; not overwriting")
        return
    shutil.copyfile(src, dst)
    print(f"wrote {dst} — edit it to override macros")


if __name__ == "__main__":
    main()
