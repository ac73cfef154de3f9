from mmbidaf_tpu.utils.profiling import timeit, trace, Timer  # noqa: F401
