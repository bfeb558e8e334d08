"""Physical-plan introspection and scale-quality gates."""

from .audit import audit_plan, plan_string  # noqa: F401
