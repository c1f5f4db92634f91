"""Remote MPC over gRPC — `MPCRemote` (dart/realtime/MPCRemote.hpp).

Reference behavior: the planner runs server-side; a thin robot client
pushes state observations and polls/streams plan updates
(`MPCListenForUpdatesReply{rollout}` streams). Here:

  * `RemoteMPCServer` wraps a host `MPC` (realtime/mpc.py) and serves
    RecordState / GetControl / GetLatestPlan
  * `RemoteMPCClient` mirrors the local `MPC` control-side API and keeps a
    local `ControlPlan` mirror so `control_now` is a local lookup between
    plan updates (the reference's buffer mirroring)

Message classes come from `proto/mpc.proto`, compiled with protoc at
import time (grpc service stubs are hand-registered via grpc generic
handlers since grpc_tools isn't in the image).
"""

from __future__ import annotations

import os
import subprocess
import threading
from typing import Optional

import numpy as np

_PROTO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "proto"
)


def _compile_proto():
    out = os.path.join(_PROTO_DIR, "mpc_pb2.py")
    src = os.path.join(_PROTO_DIR, "mpc.proto")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["protoc", f"-I{_PROTO_DIR}", f"--python_out={_PROTO_DIR}", src],
            check=True, capture_output=True,
        )
    import importlib.util

    spec = importlib.util.spec_from_file_location("ntpu_mpc_pb2", out)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


pb = _compile_proto()

_SERVICE = "nimblephysics_tpu.RemoteMPC"


def _plan_to_msg(plan) -> "pb.ControlPlan":
    msg = pb.ControlPlan(
        start_time=plan.start_time,
        dt=plan.dt,
        horizon=int(plan.u.shape[0]),
        num_actions=int(plan.u.shape[1]),
        u=np.asarray(plan.u, dtype=np.float64).ravel().tolist(),
    )
    if plan.x_ref is not None:
        msg.x_ref.extend(np.asarray(plan.x_ref, dtype=np.float64).ravel().tolist())
    if plan.K is not None:
        msg.feedback_gains.extend(
            np.asarray(plan.K, dtype=np.float64).ravel().tolist()
        )
    return msg


def _msg_to_plan(msg):
    import jax.numpy as jnp

    from nimblephysics_tpu.realtime.buffer import ControlPlan

    H, na = msg.horizon, msg.num_actions
    u = jnp.asarray(np.asarray(msg.u).reshape(H, na))
    x_ref = None
    K = None
    if msg.x_ref:
        x_ref = jnp.asarray(np.asarray(msg.x_ref).reshape(H + 1, -1))
    if msg.feedback_gains:
        nx = len(msg.feedback_gains) // (H * na)
        K = jnp.asarray(np.asarray(msg.feedback_gains).reshape(H, na, nx))
    return ControlPlan(start_time=msg.start_time, dt=msg.dt, u=u,
                       x_ref=x_ref, K=K)


class RemoteMPCServer:
    def __init__(self, mpc, port: int = 50055):
        import grpc

        self.mpc = mpc
        self._grpc = grpc

        def record_state(request, context):
            import jax.numpy as jnp

            from nimblephysics_tpu.models.model import State

            self.mpc.record_state(
                request.time,
                State.from_flat(jnp.asarray(np.asarray(request.state.values))),
            )
            return pb.Empty()

        def get_control(request, context):
            x = None
            if request.state.values:
                import jax.numpy as jnp

                x = jnp.asarray(np.asarray(request.state.values))
            u = self.mpc.control_now(request.time, None)
            if x is not None and self.mpc.plan is not None:
                from nimblephysics_tpu.realtime.buffer import control_at

                u = control_at(self.mpc.plan, request.time, x)
            return pb.Vector(values=np.asarray(u, dtype=np.float64).tolist())

        def get_latest_plan(request, context):
            plan = self.mpc.plan
            if plan is None:
                return pb.ControlPlan()
            return _plan_to_msg(plan)

        handlers = {
            "RecordState": grpc.unary_unary_rpc_method_handler(
                record_state,
                request_deserializer=pb.StateObservation.FromString,
                response_serializer=pb.Empty.SerializeToString,
            ),
            "GetControl": grpc.unary_unary_rpc_method_handler(
                get_control,
                request_deserializer=pb.ControlRequest.FromString,
                response_serializer=pb.Vector.SerializeToString,
            ),
            "GetLatestPlan": grpc.unary_unary_rpc_method_handler(
                get_latest_plan,
                request_deserializer=pb.PlanRequest.FromString,
                response_serializer=pb.ControlPlan.SerializeToString,
            ),
        }
        self.server = grpc.server(
            __import__("concurrent.futures", fromlist=["ThreadPoolExecutor"])
            .ThreadPoolExecutor(max_workers=8)
        )
        self.server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SERVICE, handlers),)
        )
        self.port = self.server.add_insecure_port(f"0.0.0.0:{port}")

    def start(self):
        self.server.start()

    def stop(self):
        self.server.stop(grace=0.2)


class RemoteMPCClient:
    """Robot-side client with a local plan mirror."""

    def __init__(self, address: str):
        import grpc

        self.channel = grpc.insecure_channel(address)
        self._record = self.channel.unary_unary(
            f"/{_SERVICE}/RecordState",
            request_serializer=pb.StateObservation.SerializeToString,
            response_deserializer=pb.Empty.FromString,
        )
        self._get_control = self.channel.unary_unary(
            f"/{_SERVICE}/GetControl",
            request_serializer=pb.ControlRequest.SerializeToString,
            response_deserializer=pb.Vector.FromString,
        )
        self._get_plan = self.channel.unary_unary(
            f"/{_SERVICE}/GetLatestPlan",
            request_serializer=pb.PlanRequest.SerializeToString,
            response_deserializer=pb.ControlPlan.FromString,
        )
        self._plan = None
        self._lock = threading.Lock()

    def record_state(self, t: float, state_flat) -> None:
        self._record(
            pb.StateObservation(
                time=t,
                state=pb.Vector(
                    values=np.asarray(state_flat, dtype=np.float64).tolist()
                ),
            )
        )

    def sync_plan(self) -> bool:
        """Pull the latest plan into the local mirror."""
        msg = self._get_plan(pb.PlanRequest())
        if msg.horizon == 0:
            return False
        with self._lock:
            self._plan = _msg_to_plan(msg)
        return True

    def control_now(self, t: float, state_flat=None):
        """Local-mirror lookup (no network on the control path)."""
        from nimblephysics_tpu.realtime.buffer import control_at

        with self._lock:
            plan = self._plan
        if plan is None:
            msg = self._get_control(pb.ControlRequest(time=t))
            return np.asarray(msg.values)
        x = None
        if state_flat is not None:
            import jax.numpy as jnp

            x = jnp.asarray(np.asarray(state_flat))
        return np.asarray(control_at(plan, t, x))
