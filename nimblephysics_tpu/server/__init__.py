"""Web visualization server — maps `dart/server/` (GUIStateMachine,
GUIWebsocketServer, GUIRecording) with a JSON command protocol."""

from nimblephysics_tpu.server.state_machine import GUIStateMachine, GUIRecording  # noqa: F401
from nimblephysics_tpu.server.gui import NimbleGUI  # noqa: F401
