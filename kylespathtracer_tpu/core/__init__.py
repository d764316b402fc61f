from kylespathtracer_tpu.core import gmath, sampler, color  # noqa: F401
