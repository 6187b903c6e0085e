from utree_tpu.utils.trace import PhaseTimer, Tracer

__all__ = ["PhaseTimer", "Tracer"]
