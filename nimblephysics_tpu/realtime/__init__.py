"""Real-time control: receding-horizon MPC, control buffers, online sysid.

Maps `dart/realtime/` (MPCLocal/MPCRemote/SSID/RealTimeControlBuffer/
Ticker/ObservationLog)."""

from nimblephysics_tpu.realtime.buffer import ControlPlan, control_at  # noqa: F401
from nimblephysics_tpu.realtime.mpc import MPC, MPCConfig  # noqa: F401
from nimblephysics_tpu.realtime.ssid import SSID, SSIDConfig  # noqa: F401
