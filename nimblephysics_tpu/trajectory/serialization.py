"""Wire-compatible serialization of trajectory rollouts.

Implements the reference's `dart.proto.TrajectoryRollout` protobuf format
(`dart/proto/TrajectoryRollout.proto`, `dart/proto/Eigen.proto`,
`SerializeEigen.cpp` — matrices are (rows, cols) with column-major packed
values) so rollouts serialized by either side deserialize on the other.
Used by the remote-MPC bridge and for persisting solutions
(`TrajectoryRollout::serialize`, `dart/trajectory/TrajectoryRollout.cpp`).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from nimblephysics_tpu.biomechanics.b3d import (
    _get_packed_doubles,
    _get_string,
    _get_varint,
    _put_bytes,
    _put_packed_doubles,
    _put_string,
    _put_varint,
    _scan_fields,
)


def _encode_matrix(mat: np.ndarray) -> bytes:
    """proto MatrixXs {rows=1, cols=2, values=3 packed col-major}."""
    mat = np.asarray(mat, dtype=np.float64)
    if mat.ndim != 2:
        raise ValueError(f"matrix expected, got shape {mat.shape}")
    return b"".join([
        _put_varint(1, mat.shape[0]),
        _put_varint(2, mat.shape[1]),
        _put_packed_doubles(3, mat.T.reshape(-1)),  # column-major
    ])


def _decode_matrix(buf: bytes) -> np.ndarray:
    f = _scan_fields(buf)
    rows, cols = _get_varint(f, 1), _get_varint(f, 2)
    vals = _get_packed_doubles(f, 3)
    return vals.reshape(cols, rows).T


def _encode_vector(vec: np.ndarray) -> bytes:
    """proto VectorXs {size=1, values=2 packed}."""
    vec = np.asarray(vec, dtype=np.float64).reshape(-1)
    return _put_varint(1, vec.size) + _put_packed_doubles(2, vec)


def _decode_vector(buf: bytes) -> np.ndarray:
    f = _scan_fields(buf)
    return _get_packed_doubles(f, 2)


def _encode_map_entry(key: str, mat: np.ndarray) -> bytes:
    """protobuf map<string, MatrixXs> entry: {key=1, value=2}."""
    return _put_string(1, key) + _put_bytes(2, _encode_matrix(mat))


def _decode_matrix_map(entries) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for _, raw in entries:
        f = _scan_fields(raw)
        out[_get_string(f, 1)] = _decode_matrix(f[2][-1][1])
    return out


def serialize_rollout(
    pos: Dict[str, np.ndarray],
    vel: Dict[str, np.ndarray],
    force: Dict[str, np.ndarray],
    mass: Optional[np.ndarray] = None,
    metadata: Optional[Dict[str, np.ndarray]] = None,
    representation_mapping: str = "identity",
) -> bytes:
    """Each map value is a (dim, steps) matrix, one entry per mapping name
    (the reference always has at least the representation mapping)."""
    parts = [_put_string(1, representation_mapping)]
    for fnum, mapping in ((2, pos), (3, vel), (4, force), (6, metadata or {})):
        for key, mat in mapping.items():
            parts.append(_put_bytes(fnum, _encode_map_entry(key, mat)))
    if mass is not None:
        parts.append(_put_bytes(5, _encode_vector(mass)))
    return b"".join(parts)


def deserialize_rollout(buf: bytes) -> dict:
    f = _scan_fields(buf)
    return dict(
        representation_mapping=_get_string(f, 1, "identity"),
        pos=_decode_matrix_map(f.get(2, [])),
        vel=_decode_matrix_map(f.get(3, [])),
        force=_decode_matrix_map(f.get(4, [])),
        mass=(_decode_vector(f[5][-1][1]) if 5 in f else np.zeros(0)),
        metadata=_decode_matrix_map(f.get(6, [])),
    )


def serialize_trajectory(traj, mass: Optional[np.ndarray] = None) -> bytes:
    """Serialize a `trajectory.shooting.Trajectory` (q/v: (T, nq), u:
    (T, na)) under the 'identity' mapping; the reference's matrices are
    (dofs, steps), so arrays transpose on the way in/out."""
    return serialize_rollout(
        pos={"identity": np.asarray(traj.q).T},
        vel={"identity": np.asarray(traj.v).T},
        force={"identity": np.asarray(traj.u).T},
        mass=mass,
    )


def deserialize_trajectory(buf: bytes):
    from nimblephysics_tpu.trajectory.shooting import Trajectory

    d = deserialize_rollout(buf)
    m = d["representation_mapping"]
    return Trajectory(
        q=d["pos"][m].T, v=d["vel"][m].T, u=d["force"][m].T
    )
