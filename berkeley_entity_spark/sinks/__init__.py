from berkeley_entity_spark.sinks.conll import parse_conll, render_conll

__all__ = ["render_conll", "parse_conll"]
