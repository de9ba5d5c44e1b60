from .profiling import timed, device_trace, roofline  # noqa: F401
