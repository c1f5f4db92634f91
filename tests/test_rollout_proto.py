"""TrajectoryRollout protobuf wire format (`dart/proto/TrajectooryRollout`
role): round-trips, plus cross-validation against the google.protobuf
runtime built from an equivalent dynamic descriptor."""

import numpy as np

from nimblephysics_tpu.trajectory.serialization import (
    deserialize_rollout,
    deserialize_trajectory,
    serialize_rollout,
    serialize_trajectory,
)
from nimblephysics_tpu.trajectory.shooting import Trajectory


def test_rollout_round_trip():
    rng = np.random.RandomState(0)
    pos = {"identity": rng.randn(5, 30), "ik": rng.randn(9, 30)}
    vel = {"identity": rng.randn(5, 30)}
    force = {"identity": rng.randn(3, 30)}
    mass = rng.rand(4)
    meta = {"costs": rng.randn(1, 30)}
    buf = serialize_rollout(pos, vel, force, mass, meta, "identity")
    d = deserialize_rollout(buf)
    assert d["representation_mapping"] == "identity"
    for name, mat in pos.items():
        assert np.allclose(d["pos"][name], mat)
    assert np.allclose(d["vel"]["identity"], vel["identity"])
    assert np.allclose(d["force"]["identity"], force["identity"])
    assert np.allclose(d["mass"], mass)
    assert np.allclose(d["metadata"]["costs"], meta["costs"])


def test_trajectory_round_trip():
    rng = np.random.RandomState(1)
    traj = Trajectory(q=rng.randn(40, 6), v=rng.randn(40, 6),
                      u=rng.randn(40, 2))
    back = deserialize_trajectory(serialize_trajectory(traj))
    assert np.allclose(back.q, traj.q)
    assert np.allclose(back.v, traj.v)
    assert np.allclose(back.u, traj.u)


def _runtime_messages():
    """Build dart.proto-compatible messages with the protobuf runtime via a
    dynamic descriptor (same field numbers/types as the reference schema)."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "rollout_compat_test.proto"
    fdp.package = "compat"
    fdp.syntax = "proto3"
    F = descriptor_pb2.FieldDescriptorProto

    mat = fdp.message_type.add()
    mat.name = "MatrixXs"
    mat.field.add(name="rows", number=1, type=F.TYPE_INT32,
                  label=F.LABEL_OPTIONAL)
    mat.field.add(name="cols", number=2, type=F.TYPE_INT32,
                  label=F.LABEL_OPTIONAL)
    mat.field.add(name="values", number=3, type=F.TYPE_DOUBLE,
                  label=F.LABEL_REPEATED)

    vec = fdp.message_type.add()
    vec.name = "VectorXs"
    vec.field.add(name="size", number=1, type=F.TYPE_INT32,
                  label=F.LABEL_OPTIONAL)
    vec.field.add(name="values", number=2, type=F.TYPE_DOUBLE,
                  label=F.LABEL_REPEATED)

    ro = fdp.message_type.add()
    ro.name = "TrajectoryRollout"
    ro.field.add(name="representationMapping", number=1, type=F.TYPE_STRING,
                 label=F.LABEL_OPTIONAL)
    for fname, num in (("pos", 2), ("vel", 3), ("force", 4), ("metadata", 6)):
        entry = ro.nested_type.add()
        entry.name = fname.capitalize() + "Entry"
        entry.options.map_entry = True
        entry.field.add(name="key", number=1, type=F.TYPE_STRING,
                        label=F.LABEL_OPTIONAL)
        entry.field.add(name="value", number=2, type=F.TYPE_MESSAGE,
                        label=F.LABEL_OPTIONAL,
                        type_name=".compat.MatrixXs")
        ro.field.add(name=fname, number=num, type=F.TYPE_MESSAGE,
                     label=F.LABEL_REPEATED,
                     type_name=".compat.TrajectoryRollout." + entry.name)
    ro.field.add(name="mass", number=5, type=F.TYPE_MESSAGE,
                 label=F.LABEL_OPTIONAL, type_name=".compat.VectorXs")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("compat.TrajectoryRollout"))


def test_wire_compatible_with_protobuf_runtime():
    RolloutMsg = _runtime_messages()
    rng = np.random.RandomState(2)
    pos = {"identity": rng.randn(4, 10)}
    vel = {"identity": rng.randn(4, 10)}
    force = {"identity": rng.randn(2, 10)}
    mass = rng.rand(3)

    # ours -> runtime
    msg = RolloutMsg()
    msg.ParseFromString(
        serialize_rollout(pos, vel, force, mass, None, "identity"))
    assert msg.representationMapping == "identity"
    m = msg.pos["identity"]
    assert (m.rows, m.cols) == (4, 10)
    assert np.allclose(
        np.asarray(m.values).reshape(10, 4).T, pos["identity"])
    assert np.allclose(np.asarray(msg.mass.values), mass)

    # runtime -> ours
    msg2 = RolloutMsg()
    msg2.representationMapping = "ik"
    m2 = msg2.vel["ik"]
    mat = rng.randn(3, 7)
    m2.rows, m2.cols = 3, 7
    m2.values.extend(mat.T.reshape(-1).tolist())
    msg2.mass.size = 2
    msg2.mass.values.extend([1.5, 2.5])
    d = deserialize_rollout(msg2.SerializeToString())
    assert d["representation_mapping"] == "ik"
    assert np.allclose(d["vel"]["ik"], mat)
    assert np.allclose(d["mass"], [1.5, 2.5])
