"""Extension-dispatch world loading — `UniversalLoader::loadWorld/loadSkeleton`
(dart/utils/UniversalLoader.hpp:27-40)."""

from __future__ import annotations

import os
from typing import Tuple

from nimblephysics_tpu.models.model import Model, State


def load_world(path: str, dtype=None) -> Tuple[Model, State]:
    """Load a world/model from .skel, .urdf, or .osim by extension."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".skel":
        from nimblephysics_tpu.utils.skel_parser import parse_skel

        return parse_skel(path, dtype=dtype)
    if ext == ".urdf":
        from nimblephysics_tpu.utils.urdf_parser import parse_urdf

        return parse_urdf(path, dtype=dtype)
    if ext == ".osim":
        from nimblephysics_tpu.utils.osim_parser import parse_osim

        model, state, _markers = parse_osim(path, dtype=dtype)
        return model, state
    if ext == ".sdf":
        from nimblephysics_tpu.utils.sdf_parser import parse_sdf

        return parse_sdf(path, dtype=dtype)
    raise ValueError(f"unsupported world format {ext!r}")
