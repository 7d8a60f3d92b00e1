from chameleon_entity_linking_spark.plans.session import get_spark  # noqa: F401
