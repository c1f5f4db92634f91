"""C3D mocap file reader — maps `dart/biomechanics/C3DLoader` / `dart/utils/C3D`.

Implements the standard C3D layout (https://www.c3d.org specification):
512-byte blocks, a binary header, a parameter section (groups/parameters),
and interleaved 3D point + analog data. Supports Intel-processor files
with integer or floating-point point data — which covers the reference's
fixtures (`data/c3d/*.c3d`).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class C3DFile:
    point_labels: List[str]
    points: np.ndarray        # (n_frames, n_points, 3), meters
    residuals: np.ndarray     # (n_frames, n_points) — <0 means missing
    frame_rate: float
    first_frame: int
    analog: Optional[np.ndarray] = None   # (n_frames * rate_mult, n_channels)
    analog_labels: Optional[List[str]] = None
    parameters: Optional[Dict[str, dict]] = None

    @property
    def num_frames(self) -> int:
        return self.points.shape[0]

    def marker_dict(self, frame: int) -> Dict[str, np.ndarray]:
        out = {}
        for i, label in enumerate(self.point_labels):
            if self.residuals[frame, i] >= 0:
                out[label] = self.points[frame, i]
        return out


def load_c3d(path: str) -> C3DFile:
    with open(path, "rb") as f:
        data = f.read()

    param_block = data[0]
    if data[1] != 0x50:
        raise ValueError("not a C3D file")

    def u16(off):
        return struct.unpack_from("<H", data, off)[0]

    def f32(off):
        return struct.unpack_from("<f", data, off)[0]

    n_points = u16(2)
    analog_per_frame = u16(4)            # total analog samples per 3D frame
    first_frame = u16(6)
    last_frame = u16(8)
    point_scale = f32(12)
    data_block = u16(16)
    analog_rate_mult = u16(18)           # analog samples per channel per frame
    frame_rate = f32(20)

    # ---- parameter section ----
    p_off = (param_block - 1) * 512
    proc_type = data[p_off + 3] - 83     # 1=Intel, 2=DEC, 3=MIPS
    if proc_type not in (1,):
        raise ValueError(f"unsupported C3D processor type {proc_type}")
    params: Dict[str, dict] = {}
    group_names: Dict[int, str] = {}
    off = p_off + 4
    while True:
        name_len = struct.unpack_from("<b", data, off)[0]
        group_id = struct.unpack_from("<b", data, off + 1)[0]
        if name_len == 0 or group_id == 0:
            break
        abs_len = abs(name_len)
        name = data[off + 2: off + 2 + abs_len].decode("ascii", "replace")
        rec_off = off + 2 + abs_len
        next_rel = u16(rec_off)
        if group_id < 0:  # group definition
            group_names[-group_id] = name
        else:             # parameter
            dtype_len = struct.unpack_from("<b", data, rec_off + 2)[0]
            ndims = data[rec_off + 3]
            dims = [data[rec_off + 4 + k] for k in range(ndims)]
            dstart = rec_off + 4 + ndims
            count = int(np.prod(dims)) if dims else 1
            if dtype_len == -1:  # char
                raw = data[dstart: dstart + count]
                if len(dims) >= 2:
                    w = dims[0]
                    vals = [
                        raw[i * w: (i + 1) * w].decode("ascii", "replace").strip()
                        for i in range(count // w)
                    ]
                else:
                    vals = raw.decode("ascii", "replace").strip()
            elif dtype_len == 1:
                vals = list(raw_bytes := data[dstart: dstart + count])
            elif dtype_len == 2:
                vals = list(
                    struct.unpack_from(f"<{count}h", data, dstart)
                )
            elif dtype_len == 4:
                vals = list(
                    struct.unpack_from(f"<{count}f", data, dstart)
                )
            else:
                vals = None
            params.setdefault(group_id, {})[name.upper()] = dict(
                dims=dims, values=vals
            )
        if next_rel == 0:
            break
        off = rec_off + next_rel

    named_params: Dict[str, dict] = {}
    for gid, ps in params.items():
        gname = group_names.get(gid, f"GROUP{gid}")
        named_params[gname.upper()] = ps

    def get_param(group, name, default=None):
        return named_params.get(group, {}).get(name, {}).get("values", default)

    labels = get_param("POINT", "LABELS", [])
    if isinstance(labels, str):
        labels = [labels]
    labels = list(labels)[:n_points]
    while len(labels) < n_points:
        labels.append(f"P{len(labels)}")

    scale_param = get_param("POINT", "SCALE")
    if scale_param:
        point_scale = float(scale_param[0])
    rate_param = get_param("POINT", "RATE")
    if rate_param:
        frame_rate = float(rate_param[0])
    units = get_param("POINT", "UNITS", "mm")
    if isinstance(units, list):
        units = units[0] if units else "mm"
    unit_scale = 0.001 if str(units).lower().startswith("mm") else 1.0

    # ---- data section ----
    n_frames = last_frame - first_frame + 1
    actual = get_param("POINT", "FRAMES")
    off = (data_block - 1) * 512
    is_float = point_scale < 0
    n_analog_ch = (
        analog_per_frame // max(analog_rate_mult, 1) if analog_per_frame else 0
    )

    points = np.zeros((n_frames, n_points, 3))
    residuals = np.zeros((n_frames, n_points))
    analog = (
        np.zeros((n_frames * max(analog_rate_mult, 1), n_analog_ch))
        if n_analog_ch
        else None
    )

    if is_float:
        frame_words = n_points * 4 + analog_per_frame
        arr = np.frombuffer(
            data, dtype="<f4", offset=off,
            count=frame_words * n_frames,
        ).reshape(n_frames, frame_words)
        pts = arr[:, : n_points * 4].reshape(n_frames, n_points, 4)
        points = pts[:, :, :3] * unit_scale
        residuals = pts[:, :, 3]
        if n_analog_ch:
            analog = arr[:, n_points * 4:].reshape(
                n_frames * analog_rate_mult, n_analog_ch
            )
    else:
        frame_words = n_points * 4 + analog_per_frame
        arr = np.frombuffer(
            data, dtype="<i2", offset=off,
            count=frame_words * n_frames,
        ).reshape(n_frames, frame_words)
        pts = arr[:, : n_points * 4].reshape(n_frames, n_points, 4)
        points = pts[:, :, :3].astype(np.float64) * point_scale * unit_scale
        residuals = pts[:, :, 3].astype(np.float64)
        if n_analog_ch:
            analog = arr[:, n_points * 4:].astype(np.float64).reshape(
                n_frames * analog_rate_mult, n_analog_ch
            )

    return C3DFile(
        point_labels=[l.strip() for l in labels],
        points=np.ascontiguousarray(points),
        residuals=np.ascontiguousarray(residuals),
        frame_rate=frame_rate,
        first_frame=first_frame,
        analog=analog,
        parameters=named_params,
    )
