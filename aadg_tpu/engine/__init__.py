from .state import Entities, SegDisState, CtrlState, build_entities, init_state
from .steps import make_pretrain_step, make_search_step
from .rl import make_controller_update
from .evaluate import validate_optic, validate_rvs, make_eval_forward

__all__ = [
    "Entities", "SegDisState", "CtrlState", "build_entities", "init_state",
    "make_pretrain_step", "make_search_step", "make_controller_update",
    "validate_optic", "validate_rvs", "make_eval_forward",
]
