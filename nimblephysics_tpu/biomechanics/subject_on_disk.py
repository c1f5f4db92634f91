"""Binary subject format — the `SubjectOnDisk` / B3D role
(`dart/biomechanics/SubjectOnDisk.hpp:76`, proto schema
`dart/proto/SubjectOnDisk.proto:16-88`).

The reference stores a protobuf header plus lz4-framed per-frame blocks
with lazy reads. This format keeps the same design (seekable header +
compressed trial blocks + lazy frame access) with a JSON header and
zlib-compressed float32 blocks (lz4 is not available in this image):

    bytes 0-7:   magic b"NTPUSUBJ"
    bytes 8-15:  little-endian u64 header length H
    bytes 16-16+H: JSON header {subject metadata, trials: [{name, dt,
                  num_frames, dof_names, offset, comp_size, raw_size}]}
    then per-trial zlib blocks of float32 frames, each frame =
    [q (nq), v (nq), tau (nq), contact (n_contact_bodies*6)]
"""

from __future__ import annotations

import dataclasses
import json
import struct
import zlib
from typing import Dict, List, Optional

import numpy as np

_MAGIC = b"NTPUSUBJ"


@dataclasses.dataclass
class TrialFrames:
    q: np.ndarray
    v: np.ndarray
    tau: np.ndarray
    contact: Optional[np.ndarray]


def write_subject(
    path: str,
    trials: List[dict],
    subject_meta: Optional[dict] = None,
) -> None:
    """trials: [{name, dt, q (T,nq), v, tau, contact (T,k) optional}]."""
    header: dict = dict(subject=subject_meta or {}, trials=[])
    blocks: List[bytes] = []
    offset = 0
    for t in trials:
        q = np.asarray(t["q"], dtype=np.float32)
        v = np.asarray(t["v"], dtype=np.float32)
        tau = np.asarray(t["tau"], dtype=np.float32)
        contact = (
            np.asarray(t["contact"], dtype=np.float32)
            if t.get("contact") is not None
            else np.zeros((q.shape[0], 0), dtype=np.float32)
        )
        frames = np.concatenate([q, v, tau, contact], axis=1)
        raw = frames.tobytes()
        comp = zlib.compress(raw, level=6)
        header["trials"].append(
            dict(
                name=t.get("name", f"trial{len(header['trials'])}"),
                dt=float(t.get("dt", 0.001)),
                num_frames=int(q.shape[0]),
                nq=int(q.shape[1]),
                n_contact=int(contact.shape[1]),
                offset=offset,
                comp_size=len(comp),
                raw_size=len(raw),
            )
        )
        blocks.append(comp)
        offset += len(comp)

    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blocks:
            f.write(b)


class SubjectOnDisk:
    """Lazy reader: the header parses on open; frames decompress per trial
    on demand (`SubjectOnDisk::readFrames` semantics)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != _MAGIC:
                raise ValueError("not a nimblephysics_tpu subject file")
            (hlen,) = struct.unpack("<Q", f.read(8))
            self.header = json.loads(f.read(hlen).decode())
            self._data_start = 16 + hlen
        self._cache: Dict[int, TrialFrames] = {}

    @property
    def num_trials(self) -> int:
        return len(self.header["trials"])

    def trial_name(self, i: int) -> str:
        return self.header["trials"][i]["name"]

    def trial_length(self, i: int) -> int:
        return self.header["trials"][i]["num_frames"]

    def trial_timestep(self, i: int) -> float:
        return self.header["trials"][i]["dt"]

    def read_frames(self, trial: int, start: int = 0, count: Optional[int] = None
                    ) -> TrialFrames:
        meta = self.header["trials"][trial]
        if trial not in self._cache:
            with open(self.path, "rb") as f:
                f.seek(self._data_start + meta["offset"])
                comp = f.read(meta["comp_size"])
            raw = zlib.decompress(comp)
            nq, nc = meta["nq"], meta["n_contact"]
            width = 3 * nq + nc
            frames = np.frombuffer(raw, dtype=np.float32).reshape(
                meta["num_frames"], width
            )
            self._cache[trial] = TrialFrames(
                q=frames[:, :nq],
                v=frames[:, nq: 2 * nq],
                tau=frames[:, 2 * nq: 3 * nq],
                contact=frames[:, 3 * nq:] if nc else None,
            )
        tf = self._cache[trial]
        end = meta["num_frames"] if count is None else start + count
        return TrialFrames(
            q=tf.q[start:end], v=tf.v[start:end], tau=tf.tau[start:end],
            contact=tf.contact[start:end] if tf.contact is not None else None,
        )
