"""Plan inspection + runtime metrics."""

from .inspect import assert_plan, plan_text

__all__ = ["assert_plan", "plan_text"]
