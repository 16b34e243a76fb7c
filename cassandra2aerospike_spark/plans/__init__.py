from .audit import PlanReport, assert_scale_posture, audit, physical_plan

__all__ = ["PlanReport", "assert_scale_posture", "audit", "physical_plan"]
