"""traiNNer-TPU: TPU-native image/video restoration training framework.

Top-level API:
  parse(path)            options file -> config tree
  create_dataset / create_dataloader
  define_G / define_D    network factories
  (trainers live in trainner_tpu.train; CLI drivers are train.py/test.py)
"""

__version__ = "0.1.0"

from .options import parse  # noqa: F401


def create_dataset(dataset_opt):
    from .data import create_dataset as _f

    return _f(dataset_opt)


def create_dataloader(dataset, dataset_opt, mesh=None):
    from .data import create_dataloader as _f

    return _f(dataset, dataset_opt, mesh)


def define_G(opt, dtype=None):
    import jax.numpy as jnp

    from .models import define_G as _f

    return _f(opt, dtype=dtype or jnp.bfloat16)


def define_D(opt, dtype=None):
    import jax.numpy as jnp

    from .models import define_D as _f

    return _f(opt, dtype=dtype or jnp.bfloat16)
