from gsdx.utils.profiling import Timer, timed, trace_to
from gsdx.utils.seeding import set_seed

__all__ = ["Timer", "timed", "trace_to", "set_seed"]
