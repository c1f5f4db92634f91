"""Jump-worm with live browser visualization (catapult/jump_worm example
class + NimbleGUI): simulate, stream frames to the three.js viewer."""

import time

import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.server import NimbleGUI
from nimblephysics_tpu.simulation.world import World


def main():
    model = builders.jump_worm(dt=0.002)
    world = World(model, State(q=jnp.zeros(4).at[2].set(1.2).at[3].set(1.2),
                               v=jnp.zeros(4)))
    gui = NimbleGUI(model)
    gui.serve(8070)
    print("viewer: http://localhost:8070 (websocket on 8071)")
    try:
        while True:
            for _ in range(8):
                world.step(record=False)
            gui.render_world(world.state)
            time.sleep(8 * 0.002)
    except KeyboardInterrupt:
        gui.stop()


if __name__ == "__main__":
    main()
