from .harness import time_fn, BenchResult  # noqa: F401
