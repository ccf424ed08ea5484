"""Physics models (the reference's modules/*, SURVEY.md §2.2)."""

from . import (  # noqa: F401
    acoustics,
    aerodynamics,
    bilaplacian,
    elasticity,
    elastodynamics,
    electrostatics,
    fourier,
    heat,
    passmo,
    poisson,
    soildynamics,
    testlab_model,
)

_ALL = [
    "poisson", "elasticity", "fourier", "electrostatics", "acoustics",
    "aerodynamics", "bilaplacian", "heat", "elastodynamics", "soildynamics", "passmo", "testlab_model",
]
