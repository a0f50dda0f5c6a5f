from diffuman4d_tpu.utils.tracing import RankedLogger, phase, report, trace_to

__all__ = ["RankedLogger", "phase", "report", "trace_to"]
