"""Stage registry — import all stage modules so @register runs."""

from .base import STAGE_REGISTRY, Stage, apply_stage, build_stage  # noqa: F401
from . import parse  # noqa: F401
from . import mutate  # noqa: F401
from . import enrich  # noqa: F401
from . import flow  # noqa: F401
from . import web  # noqa: F401
