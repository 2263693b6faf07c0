"""Physical-plan introspection helpers (shared by tests and tools)."""

from .audit import formatted_plan, plan_scorecard

__all__ = ["formatted_plan", "plan_scorecard"]
