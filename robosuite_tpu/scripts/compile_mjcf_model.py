"""Compile an MJCF file through the standalone importer and print/export it.

Re-derivation of reference scripts/compile_mjcf_model.py (which loads an XML
into mujoco and saves the compiled model back out): here the pipeline is
MJCF -> ModelSpec -> compiled Model pytree -> MJCF, exercising the importer
(models/mjcf/parser.py), the compiler (models/model.py), and the exporter
(models/mjcf/export.py) with no MuJoCo dependency.

Usage:
    python -m robosuite_tpu.scripts.compile_mjcf_model in.xml [out.xml]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input", help="path to an MJCF .xml file")
    p.add_argument("output", nargs="?", help="optional path to write round-tripped MJCF")
    args = p.parse_args(argv)

    from robosuite_tpu.models.mjcf.export import export_xml
    from robosuite_tpu.models.mjcf.parser import parse_mjcf

    with open(args.input) as f:
        spec = parse_mjcf(f.read())
    model = spec.compile()
    print(
        f"compiled: nq={model.nq} nv={model.nv} nu={model.nu} nbody={model.nbody} "
        f"njnt={model.njnt} ngeom={model.ngeom} nsite={model.nsite} ncam={model.ncam} "
        f"npair={model.npair} neq={model.neq}"
    )
    print("bodies:", ", ".join(model.body_names))
    if args.output:
        xml = export_xml(spec)
        with open(args.output, "w") as f:
            f.write(xml)
        print(f"wrote {args.output} ({len(xml)} bytes)")


if __name__ == "__main__":
    main()
