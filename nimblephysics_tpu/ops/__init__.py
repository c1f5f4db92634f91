"""Numerical kernels: Lie-group math, spatial algebra, articulated dynamics,
collision, and LCP solvers. All functions are pure, shape-static, and
`vmap`/`jit`-friendly."""
