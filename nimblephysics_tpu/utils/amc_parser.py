"""CMU mocap ASF/AMC parsers — maps `dart/utils/amc/`.

ASF defines the skeleton (bone hierarchy, directions, lengths, dof axes);
AMC holds per-frame joint values. This reader returns plain data
structures; retargeting onto a Model goes through the IK machinery
(`neural.mappings.ik_solve` / `biomechanics.SkeletonConverter` patterns).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np


@dataclasses.dataclass
class AsfBone:
    name: str
    direction: np.ndarray
    length: float
    axis: np.ndarray            # axis rotation (degrees, XYZ order)
    dof: List[str]              # e.g. ["rx", "ry", "rz"]
    parent: str = ""


@dataclasses.dataclass
class AsfSkeleton:
    bones: Dict[str, AsfBone]
    root_order: List[str]
    hierarchy: Dict[str, List[str]]


def parse_asf(path: str) -> AsfSkeleton:
    bones: Dict[str, AsfBone] = {}
    hierarchy: Dict[str, List[str]] = {}
    root_order: List[str] = []
    section = None
    cur: Dict = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith(":"):
                section = line[1:].split()[0]
                continue
            if section == "root" and line.startswith("order"):
                root_order = line.split()[1:]
            elif section == "bonedata":
                if line == "begin":
                    cur = dict(dof=[], axis=np.zeros(3))
                elif line == "end":
                    bones[cur["name"]] = AsfBone(
                        name=cur["name"],
                        direction=cur.get("direction", np.zeros(3)),
                        length=cur.get("length", 0.0),
                        axis=cur.get("axis", np.zeros(3)),
                        dof=cur.get("dof", []),
                    )
                else:
                    parts = line.split()
                    key = parts[0]
                    if key == "name":
                        cur["name"] = parts[1]
                    elif key == "direction":
                        cur["direction"] = np.asarray(
                            [float(x) for x in parts[1:4]]
                        )
                    elif key == "length":
                        cur["length"] = float(parts[1])
                    elif key == "axis":
                        cur["axis"] = np.asarray([float(x) for x in parts[1:4]])
                    elif key == "dof":
                        cur["dof"] = parts[1:]
            elif section == "hierarchy":
                if line in ("begin", "end"):
                    continue
                parts = line.split()
                hierarchy[parts[0]] = parts[1:]
                for child in parts[1:]:
                    if child in bones:
                        bones[child].parent = parts[0]
    return AsfSkeleton(bones=bones, root_order=root_order, hierarchy=hierarchy)


def parse_amc(path: str) -> List[Dict[str, np.ndarray]]:
    """Returns a list of frames: {bone_name: values array}."""
    frames: List[Dict[str, np.ndarray]] = []
    current: Dict[str, np.ndarray] = None
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or line.startswith(":"):
                continue
            parts = line.split()
            if len(parts) == 1 and parts[0].isdigit():
                if current is not None:
                    frames.append(current)
                current = {}
            elif current is not None:
                current[parts[0]] = np.asarray([float(x) for x in parts[1:]])
    if current:
        frames.append(current)
    return frames
