from .schedulers import Schedule, SchedulerConfig, cfg_combine

__all__ = ["Schedule", "SchedulerConfig", "cfg_combine"]
