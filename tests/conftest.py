"""Test configuration: REAL local CPU backend, virtual 8-device mesh, f64.

The sandbox's axon sitecustomize (PYTHONPATH=/root/.axon_site) routes ALL
XLA compiles — including the CPU platform — through a remote TPU compile
service: ~10s per computation and float32-precision transcendentals even
under x64. Tests need exact local f64 (finite-difference ground truth), so
if the axon hooks are active we re-exec the whole pytest process with a
clean environment before jax is imported.

Multi-chip sharding tests run over `xla_force_host_platform_device_count=8`
exactly like the driver's `dryrun_multichip` harness.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _needs_reexec() -> bool:
    if os.environ.get("NIMBLE_TPU_TEST_REEXEC"):
        return False
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) or (
        os.environ.get("JAX_PLATFORMS", "") == "axon"
    )


def _restore_real_stdio() -> None:
    """pytest's fd-capture replaces fd1/fd2 with temp files before conftest
    import; the exec'd process would write its whole report into the doomed
    capture file. pytest keeps dup()s of the original fds — find them in
    /proc/self/fd (pipes/ttys, not the capture temp files) and put them back.
    Best-effort: on failure the exit code still propagates, only output is
    lost."""
    try:
        candidates = []
        regfiles = []
        for fd_name in sorted(os.listdir("/proc/self/fd"), key=int):
            fd = int(fd_name)
            if fd <= 2:
                continue
            try:
                target = os.readlink(f"/proc/self/fd/{fd}")
            except OSError:
                continue
            if target.startswith("pipe:") or target.startswith("/dev/pts") or target.startswith("/dev/tty"):
                candidates.append(fd)
            elif (
                target.startswith("/")
                and not target.startswith("/dev/")
                and "(deleted)" not in target
                and os.path.isfile(target)
            ):
                # a live regular file = an explicit `> log` redirect from
                # the invoking shell (pytest's capture temp files are
                # unlinked; /dev/null and sockets are not logs)
                regfiles.append(fd)
        if not candidates:
            candidates = regfiles
        if candidates:
            os.dup2(candidates[0], 1)
            os.dup2(candidates[1] if len(candidates) > 1 else candidates[0], 2)
    except Exception:
        pass


if _needs_reexec():
    _restore_real_stdio()
    env = dict(os.environ)
    env["NIMBLE_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO_ROOT
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, _REPO_ROOT)

import jax

jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite's cold run is dominated by XLA:CPU
# compiles of big solver graphs; warm reruns hit this cache instead.
_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache_cpu")


def _prune_foreign_cache_entries(cache_dir: str) -> None:
    """Remove cache entries compiled for a different target machine.

    The sandbox's remote compile service emits XLA:CPU AOT artifacts with
    axon-tuned target features (+prefer-no-scatter/+prefer-no-gather);
    loading those into the local CPU backend has produced hard SIGSEGV in
    `compilation_cache.get_executable_and_time` mid-suite. Entries are
    small; deleting a handful only costs a recompile."""
    try:
        import glob

        for f in glob.glob(os.path.join(cache_dir, "*-cache")):
            try:
                with open(f, "rb") as fh:
                    data = fh.read()
                if b"prefer-no-gather" in data or b"prefer-no-scatter" in data:
                    os.remove(f)
            except OSError:
                continue
    except Exception:
        pass


_prune_foreign_cache_entries(_CACHE_DIR)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
