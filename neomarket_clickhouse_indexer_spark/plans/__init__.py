from .explain import explain_str, plan_asserts

__all__ = ["explain_str", "plan_asserts"]
