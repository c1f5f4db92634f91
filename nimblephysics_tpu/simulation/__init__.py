"""World stepping: the differentiable timestep and rollouts."""
