from graphula_spark.plans.bgp import Var, TriplePattern, BgpPlanner

__all__ = ["Var", "TriplePattern", "BgpPlanner"]
