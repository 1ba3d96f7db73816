from .schedules import DiffusionSchedule, get_sigmas, make_schedule, subsample_schedule
from .loss import dsm_loss
from . import samplers

__all__ = [
    "DiffusionSchedule",
    "get_sigmas",
    "make_schedule",
    "subsample_schedule",
    "dsm_loss",
    "samplers",
]
