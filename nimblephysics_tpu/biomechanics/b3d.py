"""Reader/writer for the reference's actual B3D binary subject format.

This is wire-compatible interop with `dart/biomechanics/SubjectOnDisk.cpp`
(AddBiomechanics dataset files): a user switching from the reference can
load their existing `.b3d`/`.bin` subjects here, and files written here
parse with the reference's reader.

File layout (`SubjectOnDisk.cpp:110-127` read, `:1215-1245` write):

    bytes 0-7   : little-endian int64 = serialized header length H
    bytes 8-8+H : protobuf `SubjectOnDiskHeader` message
    then        : one protobuf `SubjectOnDiskFrame` per frame, all trials
                  concatenated, every frame serialized to EXACTLY
                  `header.frame_size` bytes (constant counts of packed
                  fixed64 doubles make this automatic), so `readFrames`
                  can seek randomly (`SubjectOnDisk.cpp:1139-1143`).

The protobuf messages are decoded/encoded directly at the wire level here
(varints + packed scalars) rather than via generated classes; field
numbers and semantics follow `dart/proto/SubjectOnDisk.proto:16-117`.
Native python module `subject_on_disk.py` remains the TPU-side training
format; this module is the interop bridge.
"""

from __future__ import annotations

import dataclasses
import enum
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Minimal protobuf wire codec


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _scan_fields(buf: bytes) -> Dict[int, List[Tuple[int, object]]]:
    """Decode a message into {field_number: [(wire_type, raw_value), ...]}.
    Length-delimited values stay as bytes; callers interpret them."""
    fields: Dict[int, List[Tuple[int, object]]] = {}
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:
            v, i = _read_varint(buf, i)
        elif wtype == 1:
            v = buf[i : i + 8]
            i += 8
        elif wtype == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wtype == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        fields.setdefault(fnum, []).append((wtype, v))
    return fields


def _get_varint(fields, fnum, default=0) -> int:
    vals = fields.get(fnum)
    return int(vals[-1][1]) if vals else default


def _get_double(fields, fnum, default=0.0) -> float:
    vals = fields.get(fnum)
    if not vals:
        return default
    return struct.unpack("<d", vals[-1][1])[0]


def _get_string(fields, fnum, default="") -> str:
    vals = fields.get(fnum)
    return vals[-1][1].decode("utf-8", "replace") if vals else default


def _get_strings(fields, fnum) -> List[str]:
    return [v.decode("utf-8", "replace") for _, v in fields.get(fnum, [])]


def _get_packed_doubles(fields, fnum) -> np.ndarray:
    """repeated double: packed (length-delimited fixed64 run) or unpacked."""
    chunks = []
    for wtype, v in fields.get(fnum, []):
        if wtype == 2:
            chunks.append(np.frombuffer(v, dtype="<f8"))
        else:
            chunks.append(np.frombuffer(v, dtype="<f8"))
    return np.concatenate(chunks) if chunks else np.zeros(0)


def _get_packed_floats(fields, fnum) -> np.ndarray:
    chunks = [np.frombuffer(v, dtype="<f4") for _, v in fields.get(fnum, [])]
    return np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.float32)


def _get_packed_varints(fields, fnum) -> List[int]:
    out: List[int] = []
    for wtype, v in fields.get(fnum, []):
        if wtype == 0:
            out.append(int(v))
        else:
            i = 0
            while i < len(v):
                x, i = _read_varint(v, i)
                out.append(x)
    return out


def _field(fnum: int, wtype: int) -> bytes:
    return _write_varint((fnum << 3) | wtype)


def _put_varint(fnum: int, value: int) -> bytes:
    return _field(fnum, 0) + _write_varint(int(value))


def _put_double(fnum: int, value: float) -> bytes:
    return _field(fnum, 1) + struct.pack("<d", float(value))


def _put_bytes(fnum: int, value: bytes) -> bytes:
    return _field(fnum, 2) + _write_varint(len(value)) + value


def _put_string(fnum: int, value: str) -> bytes:
    return _put_bytes(fnum, value.encode("utf-8"))


def _put_packed_doubles(fnum: int, values: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(np.asarray(values, dtype="<f8"))
    if arr.size == 0:
        return b""
    return _put_bytes(fnum, arr.tobytes())


def _put_packed_floats(fnum: int, values: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(np.asarray(values, dtype="<f4"))
    if arr.size == 0:
        return b""
    return _put_bytes(fnum, arr.tobytes())


def _put_packed_varints(fnum: int, values) -> bytes:
    if len(values) == 0:
        return b""
    payload = b"".join(_write_varint(int(v)) for v in values)
    return _put_bytes(fnum, payload)


# ---------------------------------------------------------------------------
# Schema (field numbers cite dart/proto/SubjectOnDisk.proto)


class MissingGRFReason(enum.IntEnum):
    """dart/proto/SubjectOnDisk.proto:5-14."""

    NOT_MISSING = 0
    MEASURED_GRF_ZERO_WHEN_ACCELERATION_NONZERO = 1
    UNMEASURED_EXTERNAL_FORCE_DETECTED = 2
    TORQUE_DISCREPANCY = 3
    FORCE_DISCREPANCY = 4
    NOT_OVER_FORCE_PLATE = 5
    MISSING_IMPACT = 6
    MISSING_BLIP = 7
    SHIFT_GRF = 8


@dataclasses.dataclass
class B3DTrial:
    """One trial's metadata (`SubjectOnDiskTrialHeader`, proto :16-50)."""

    name: str = ""
    length: int = 0
    timestep: float = 0.01
    missing_grf: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=bool))
    missing_grf_reason: List[MissingGRFReason] = dataclasses.field(
        default_factory=list)
    dof_positions_observed: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=bool))
    dof_velocities_finite_differenced: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=bool))
    dof_acceleration_finite_differenced: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=bool))
    residual: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.float32))
    tags: List[str] = dataclasses.field(default_factory=list)
    num_force_plates: int = 0
    force_plate_corners: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0))
    joints_max_velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.float32))


@dataclasses.dataclass
class B3DFrames:
    """Dense arrays for a contiguous frame range of one trial
    (`SubjectOnDiskFrame`, proto :90-117). Leading axis = frames."""

    pos: np.ndarray
    vel: np.ndarray
    acc: np.ndarray
    tau: np.ndarray
    ground_contact_wrench: np.ndarray       # (T, n_contact*6)
    ground_contact_cop: np.ndarray          # (T, n_contact*3)
    ground_contact_torque: np.ndarray
    ground_contact_force: np.ndarray
    com_pos: np.ndarray                     # (T, 3)
    com_vel: np.ndarray
    com_acc: np.ndarray
    custom_values: np.ndarray
    marker_obs: np.ndarray                  # (T, n_markers*3), NaN = unseen
    acc_obs: np.ndarray
    gyro_obs: np.ndarray
    emg_obs: np.ndarray
    raw_force_plate_cop: np.ndarray
    raw_force_plate_torque: np.ndarray
    raw_force_plate_force: np.ndarray


def _parse_trial_header(buf: bytes, name: str) -> B3DTrial:
    f = _scan_fields(buf)
    return B3DTrial(
        name=name,
        length=_get_varint(f, 3),
        timestep=_get_double(f, 4, 0.01),
        missing_grf=np.asarray(_get_packed_varints(f, 1), dtype=bool),
        missing_grf_reason=[
            MissingGRFReason(v) for v in _get_packed_varints(f, 2)
        ],
        dof_positions_observed=np.asarray(
            _get_packed_varints(f, 5), dtype=bool),
        dof_velocities_finite_differenced=np.asarray(
            _get_packed_varints(f, 6), dtype=bool),
        dof_acceleration_finite_differenced=np.asarray(
            _get_packed_varints(f, 7), dtype=bool),
        residual=_get_packed_floats(f, 8),
        tags=_get_strings(f, 9),
        num_force_plates=_get_varint(f, 10),
        force_plate_corners=_get_packed_doubles(f, 11),
        joints_max_velocity=_get_packed_floats(f, 12),
    )


_FRAME_FIELDS = (  # (attr, field number) — proto :90-117
    ("pos", 1), ("vel", 2), ("acc", 3), ("tau", 4),
    ("ground_contact_wrench", 5), ("ground_contact_cop", 6),
    ("ground_contact_torque", 7), ("ground_contact_force", 8),
    ("com_pos", 9), ("com_vel", 10), ("com_acc", 11),
    ("custom_values", 12), ("marker_obs", 13), ("acc_obs", 14),
    ("gyro_obs", 15), ("raw_force_plate_cop", 16),
    ("raw_force_plate_torque", 17), ("raw_force_plate_force", 18),
    ("emg_obs", 19),
)


class B3DSubject:
    """Lazy reader mirroring `SubjectOnDisk` (`SubjectOnDisk.hpp:76`):
    the header parses on open; `read_frames` seeks per frame."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as fh:
            (header_size,) = struct.unpack("<q", fh.read(8))
            if header_size <= 0 or header_size > 1 << 40:
                raise ValueError(f"{path}: bad B3D header size {header_size}")
            header = _scan_fields(fh.read(header_size))
        self._data_start = 8 + header_size

        self.num_dofs = _get_varint(header, 1)
        self.num_trials = _get_varint(header, 2)
        self.ground_contact_bodies = _get_strings(header, 3)
        self.custom_value_names = _get_strings(header, 6)
        self.custom_value_lengths = _get_packed_varints(header, 7)
        self.osim_text = _get_string(header, 8)
        self.href = _get_string(header, 11)
        self.notes = _get_string(header, 12)
        self.version = _get_varint(header, 13)
        self.frame_size = _get_varint(header, 14)
        self.biological_sex = _get_string(header, 15)
        self.height_m = _get_double(header, 16)
        self.mass_kg = _get_double(header, 17)
        self.age_years = _get_varint(header, 18)
        self.marker_names = _get_strings(header, 19)
        self.acc_names = _get_strings(header, 20)
        self.gyro_names = _get_strings(header, 21)
        self.subject_tags = _get_strings(header, 22)
        self.emg_names = _get_strings(header, 23)
        self.emg_dim = _get_varint(header, 24)

        names = _get_strings(header, 10)
        self.trials: List[B3DTrial] = []
        for k, (_, raw) in enumerate(header.get(9, [])):
            name = names[k] if k < len(names) else f"trial{k}"
            self.trials.append(_parse_trial_header(raw, name))

    # reference getter parity (SubjectOnDisk.hpp)
    def trial_length(self, trial: int) -> int:
        return self.trials[trial].length

    def trial_timestep(self, trial: int) -> float:
        return self.trials[trial].timestep

    def trial_name(self, trial: int) -> str:
        return self.trials[trial].name

    def probably_missing_grf(self, trial: int) -> np.ndarray:
        return self.trials[trial].missing_grf

    def missing_grf_reason(self, trial: int) -> List[MissingGRFReason]:
        return self.trials[trial].missing_grf_reason

    def read_frames(
        self,
        trial: int,
        start: int = 0,
        count: Optional[int] = None,
        stride: int = 1,
    ) -> B3DFrames:
        """`SubjectOnDisk::readFrames` (`SubjectOnDisk.cpp:1040+`): seek to
        `8 + header + frame_size * linear_index` per frame."""
        linear0 = sum(t.length for t in self.trials[:trial]) + start
        remaining = max(self.trials[trial].length - start, 0)
        n = remaining if count is None else min(count, remaining)
        cols: Dict[str, List[np.ndarray]] = {a: [] for a, _ in _FRAME_FIELDS}
        with open(self.path, "rb") as fh:
            for i in range(max(n, 0)):
                fh.seek(self._data_start
                        + self.frame_size * (linear0 + i * stride))
                fields = _scan_fields(fh.read(self.frame_size))
                for attr, fnum in _FRAME_FIELDS:
                    cols[attr].append(_get_packed_doubles(fields, fnum))
        return B3DFrames(**{
            attr: (np.stack(v) if v else np.zeros((0, 0)))
            for attr, v in cols.items()
        })


def load_b3d(path: str) -> B3DSubject:
    return B3DSubject(path)


def write_b3d(
    path: str,
    num_dofs: int,
    trials: List[dict],
    ground_contact_bodies: Optional[List[str]] = None,
    osim_text: str = "",
    marker_names: Optional[List[str]] = None,
    biological_sex: str = "unknown",
    height_m: float = 0.0,
    mass_kg: float = 0.0,
    age_years: int = 0,
    href: str = "",
    notes: str = "",
) -> None:
    """Write a reference-readable B3D file.

    trials: [{name, timestep, pos (T,nq), vel, acc, tau, optional
    ground_contact_wrench/cop/torque/force, com_pos/vel/acc, marker_obs,
    missing_grf (T,), residual (T,)}]. Every frame must serialize to the
    same byte count (reference seeks by constant `frame_size`,
    `SubjectOnDisk.cpp:1240`), which packed fixed64 encoding guarantees
    when per-frame array widths are constant — asserted below.
    """
    contact = ground_contact_bodies or []
    markers = marker_names or []

    trial_headers = []
    frame_blobs: List[bytes] = []
    for t in trials:
        pos = np.asarray(t["pos"], dtype=np.float64)
        T, nq = pos.shape
        assert nq == num_dofs, (nq, num_dofs)
        vel = np.asarray(t["vel"], dtype=np.float64)
        acc = np.asarray(t.get("acc", np.zeros_like(pos)), dtype=np.float64)
        tau = np.asarray(t.get("tau", np.zeros_like(pos)), dtype=np.float64)
        missing = np.asarray(
            t.get("missing_grf", np.zeros(T, dtype=bool)), dtype=bool)
        residual = np.asarray(
            t.get("residual", np.zeros(T)), dtype=np.float32)

        th = b"".join([
            _put_packed_varints(1, missing.astype(int)),
            _put_packed_varints(2, [
                (MissingGRFReason.UNMEASURED_EXTERNAL_FORCE_DETECTED
                 if m else MissingGRFReason.NOT_MISSING) for m in missing]),
            _put_varint(3, T),
            _put_double(4, float(t.get("timestep", 0.01))),
            _put_packed_varints(5, np.ones(num_dofs, dtype=int)),
            _put_packed_varints(6, np.ones(num_dofs, dtype=int)),
            _put_packed_varints(7, np.ones(num_dofs, dtype=int)),
            _put_packed_floats(8, residual),
            _put_varint(10, int(t.get("num_force_plates", 0))),
        ])
        trial_headers.append(th)

        wrench = np.asarray(
            t.get("ground_contact_wrench",
                  np.zeros((T, 6 * len(contact)))), dtype=np.float64)
        cop = np.asarray(
            t.get("ground_contact_cop",
                  np.zeros((T, 3 * len(contact)))), dtype=np.float64)
        gct = np.asarray(
            t.get("ground_contact_torque",
                  np.zeros((T, 3 * len(contact)))), dtype=np.float64)
        gcf = np.asarray(
            t.get("ground_contact_force",
                  np.zeros((T, 3 * len(contact)))), dtype=np.float64)
        com_pos = np.asarray(
            t.get("com_pos", np.zeros((T, 3))), dtype=np.float64)
        com_vel = np.asarray(
            t.get("com_vel", np.zeros((T, 3))), dtype=np.float64)
        com_acc = np.asarray(
            t.get("com_acc", np.zeros((T, 3))), dtype=np.float64)
        marker_obs = np.asarray(
            t.get("marker_obs",
                  np.full((T, 3 * len(markers)), np.nan)), dtype=np.float64)

        for k in range(T):
            frame_blobs.append(b"".join([
                _put_packed_doubles(1, pos[k]),
                _put_packed_doubles(2, vel[k]),
                _put_packed_doubles(3, acc[k]),
                _put_packed_doubles(4, tau[k]),
                _put_packed_doubles(5, wrench[k]),
                _put_packed_doubles(6, cop[k]),
                _put_packed_doubles(7, gct[k]),
                _put_packed_doubles(8, gcf[k]),
                _put_packed_doubles(9, com_pos[k]),
                _put_packed_doubles(10, com_vel[k]),
                _put_packed_doubles(11, com_acc[k]),
                _put_packed_doubles(13, marker_obs[k]),
            ]))

    frame_size = len(frame_blobs[0]) if frame_blobs else 0
    for blob in frame_blobs:
        assert len(blob) == frame_size, "frames must share one wire size"

    header = b"".join([
        _put_varint(1, num_dofs),
        _put_varint(2, len(trials)),
        b"".join(_put_string(3, s) for s in contact),
        _put_string(8, osim_text) if osim_text else b"",
        b"".join(_put_bytes(9, th) for th in trial_headers),
        b"".join(_put_string(10, t.get("name", f"trial{i}"))
                 for i, t in enumerate(trials)),
        _put_string(11, href) if href else b"",
        _put_string(12, notes) if notes else b"",
        _put_varint(13, 1),                       # format version
        _put_varint(14, frame_size),
        _put_string(15, biological_sex),
        _put_double(16, height_m),
        _put_double(17, mass_kg),
        _put_varint(18, age_years),
        b"".join(_put_string(19, s) for s in markers),
    ])

    with open(path, "wb") as fh:
        fh.write(struct.pack("<q", len(header)))
        fh.write(header)
        for blob in frame_blobs:
            fh.write(blob)
