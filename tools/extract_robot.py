#!/usr/bin/env python3
"""Extract robot description data (masses, inertias, joints, frames) from a URDF
into the framework's JSON asset format.

Usage:
    python tools/extract_robot.py <urdf-path> <output-json>

This is run once per robot variant against the vendor URDF (Unitree G1
descriptions, BSD-3); the framework then loads only the JSON asset — no XML
parsing on the hot path and no runtime dependency on the original files.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from g1_locomotion_tpu.models.urdf import parse_urdf, spec_to_dict


def main() -> None:
    urdf_path, out_path = sys.argv[1], sys.argv[2]
    spec = parse_urdf(Path(urdf_path).read_text())
    d = spec_to_dict(spec)
    Path(out_path).write_text(json.dumps(d, indent=1))
    njoints = len([b for b in spec.bodies if b.joint is not None])
    mass = sum(b.mass for b in spec.bodies)
    print(f"{spec.name}: {njoints} joints, {len(spec.bodies)} bodies, "
          f"{len(spec.frames)} frames, total mass {mass:.4f} kg -> {out_path}")
    print("joint order:", spec.joint_names)


if __name__ == "__main__":
    main()
