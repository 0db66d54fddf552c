"""Serializable query IR mirroring the reference's storage-plan tuples."""

from adfs_spark.plans.ir import FindPlan, execute_plan, plan_from_dict

__all__ = ["FindPlan", "execute_plan", "plan_from_dict"]
