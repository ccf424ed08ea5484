"""Physics models (the reference's modules/*, SURVEY.md §2.2)."""

from . import poisson  # noqa: F401
from . import elasticity  # noqa: F401

_ALL = ["poisson", "elasticity"]
