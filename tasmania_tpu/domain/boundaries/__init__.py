from tasmania_tpu.domain.boundaries import dirichlet, identity, periodic, relaxed  # noqa: F401
