"""Scene construction: builder nodes, flattening, generators, bounds."""
from . import nodes, flatten
from .nodes import *  # noqa: F401,F403
from .flatten import FlatScene, Plan, flatten  # noqa: F401
