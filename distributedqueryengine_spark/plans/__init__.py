"""Query-plan extraction for the API / UI layer."""

from distributedqueryengine_spark.plans.extract import plan_report

__all__ = ["plan_report"]
