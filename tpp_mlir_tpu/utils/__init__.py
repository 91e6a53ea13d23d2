from .target import TargetInfo, current_target, roofline_flops

__all__ = ["TargetInfo", "current_target", "roofline_flops"]
