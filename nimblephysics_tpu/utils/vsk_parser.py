"""Vicon VSK skeleton parser — maps `dart/utils/VskParser`.

Reads the marker definitions of a Vicon .vsk file: parameters, segments,
and marker positions (parameter-expression offsets resolved against the
Parameters table). Units are millimeters (converted to meters).
"""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class VskMarker:
    name: str
    segment: str
    position: np.ndarray  # (3,), meters


@dataclasses.dataclass
class VskFile:
    parameters: Dict[str, float]
    segments: List[str]
    markers: List[VskMarker]
    sticks: List[Tuple[str, str]]

    def markers_for_segment(self, segment: str) -> List[VskMarker]:
        return [m for m in self.markers if m.segment == segment]


def _eval_component(expr: str, params: Dict[str, float]) -> float:
    expr = expr.strip()
    if not expr:
        return 0.0
    neg = expr.startswith("-")
    if neg:
        expr = expr[1:]
    try:
        val = float(expr)
    except ValueError:
        if "*" in expr:
            parts = expr.split("*")
            val = 1.0
            for p in parts:
                val *= _eval_component(p, params)
        else:
            val = params.get(expr, 0.0)
    return -val if neg else val


def parse_vsk(path: str) -> VskFile:
    tree = ET.parse(path)
    root = tree.getroot()

    params: Dict[str, float] = {}
    p_el = root.find("Parameters")
    if p_el is not None:
        for p in p_el.findall("Parameter"):
            try:
                params[p.get("NAME")] = float(p.get("VALUE", "0"))
            except (TypeError, ValueError):
                pass

    segments: List[str] = []
    skel = root.find("Skeleton")
    if skel is not None:
        for seg in skel.iter("Segment"):
            name = seg.get("NAME")
            if name:
                segments.append(name)

    markers: List[VskMarker] = []
    mset = root.find("MarkerSet")
    if mset is not None:
        for m in mset.iter("Marker"):
            name = m.get("NAME")
            segment = m.get("SEGMENT", "")
            pos_text = m.get("POSITION", "0 0 0")
            comps = pos_text.split()
            pos = np.asarray(
                [_eval_component(c, params) for c in comps], dtype=np.float64
            )
            markers.append(
                VskMarker(name=name, segment=segment, position=pos * 1e-3)
            )

    sticks: List[Tuple[str, str]] = []
    if mset is not None:
        for s in mset.iter("Stick"):
            a, b = s.get("MARKER1"), s.get("MARKER2")
            if a and b:
                sticks.append((a, b))

    return VskFile(parameters=params, segments=segments, markers=markers,
                   sticks=sticks)
