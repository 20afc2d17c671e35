"""Sharding, collectives, and multi-host execution.

Submodules import lazily so that ``pathtracer_tpu.parallel.distributed``
can be imported (and ``jax.distributed.initialize`` called) before anything
touches the XLA backend.
"""

_SUBMODULES = ("mesh", "render", "distributed")


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"pathtracer_tpu.parallel.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
